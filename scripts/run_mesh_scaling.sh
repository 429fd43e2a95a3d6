#!/bin/bash
# Virtual-device scaling curve -> MULTICHIP_SCALING.json (VERDICT r1 weak #8).
set -e
cd "$(dirname "$0")/.."
for n in 1 2 4 8; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=$n" \
  python scripts/virtual_mesh_scaling.py --out /tmp/scale_$n.json
done
python - <<'EOF'
import json
pts = [json.load(open(f"/tmp/scale_{n}.json")) for n in (1, 2, 4, 8)]
base = pts[0]
curve = {
    "host_physical_cores": 4,
    "note": ("XLA:CPU multithreads a single device, so the 4-core host caps "
             "the achievable speedup; the curve validates the shardings "
             "partition work without resharding stalls."),
    "points": [
        {
            "devices": p["devices"],
            **{k: p[k] for k in ("flow_s", "seg_s", "ba_s")},
            **{f"{k[:-2]}_speedup": base[k] / p[k] for k in ("flow_s", "seg_s", "ba_s")},
            **({"ba_counters": p["ba_counters"]} if "ba_counters" in p else {}),
        }
        for p in pts
    ],
}
json.dump(curve, open("MULTICHIP_SCALING.json", "w"), indent=1)
print(json.dumps(curve["points"], indent=1))
EOF
