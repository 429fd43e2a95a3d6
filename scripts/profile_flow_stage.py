"""Per-phase profiling of the flow stage at protocol scale (dev tool).

Runs the flow stage's phases (net inference, photometric refinement, selfcal,
.flo writes) separately with wall timers, twice, so compile and steady-state
costs separate. Single TPU process.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from particlesfm_tpu.pipeline.run import load_image_stack, DEFAULT_RAFT_CKPT
    from particlesfm_tpu.flow.infer import load_flow_apply_pairs

    img_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "data/acc13/seqs/seq_01_dyn/images")
    images, names = load_image_stack(img_dir)
    T, H, W = images.shape[:3]
    print(f"{T} frames {W}x{H}", flush=True)

    t0 = time.time()
    raft_apply = load_flow_apply_pairs(str(DEFAULT_RAFT_CKPT))
    print(f"load ckpt: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    stack_u8 = jax.device_put(
        jnp.asarray(np.clip(np.round(images), 0, 255), jnp.uint8))
    jax.block_until_ready(stack_u8)
    print(f"upload stack: {time.time()-t0:.1f}s", flush=True)

    # pair lists for all four directions
    dirs = {"flow_f": 1, "flow_b": -1, "flow_f2": 2, "flow_b2": -2}
    ia_all, ib_all, npairs_l = [], [], []
    for name, stride in dirs.items():
        npairs = T - abs(stride)
        ia = np.arange(npairs) + (0 if stride > 0 else abs(stride))
        ib = np.arange(npairs) + (abs(stride) if stride > 0 else 0)
        ia_all.append(ia)
        ib_all.append(ib)
        npairs_l.append(npairs)
    ia_cat, ib_cat = np.concatenate(ia_all), np.concatenate(ib_all)

    for rep in range(2):
        t0 = time.time()
        flows = raft_apply(stack_u8, ia_cat, ib_cat)
        jax.block_until_ready(flows)
        dt = time.time() - t0
        print(f"net rep{rep}: {dt:.1f}s ({len(ia_cat)/dt:.1f} pairs/s)",
              flush=True)

    # photometric refinement over one direction's pairs (f stride-1 = 47)
    from particlesfm_tpu.flow.refine import photometric_refine_scheduled

    B = 8

    @jax.jit
    def _prep(stack, idx):
        return stack[idx].astype(jnp.float32) / 255.0

    n1 = npairs_l[0]
    fl = flows[:n1]
    for rep in range(2):
        t0 = time.time()
        out = []
        for s in range(0, n1, B):
            a, b = ia_all[0][s:s+B], ib_all[0][s:s+B]
            f0 = fl[s:s+B]
            pad = B - f0.shape[0]
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad)])
                b = np.concatenate([b, np.repeat(b[-1:], pad)])
                f0 = jnp.concatenate([f0, jnp.repeat(f0[-1:], pad, 0)])
            ref = photometric_refine_scheduled(
                _prep(stack_u8, jnp.asarray(a)), _prep(stack_u8, jnp.asarray(b)),
                f0)
            out.append(ref[:B - pad] if pad else ref)
        out = jnp.concatenate(out)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"refine rep{rep} (1 dir, {n1} pairs): {dt:.1f}s "
              f"({n1/dt:.1f} pairs/s)", flush=True)

    # selfcal
    from particlesfm_tpu.globalsfm.selfcal import estimate_focal_from_flows

    result = {"flow_f": flows[:n1], "flow_b": flows[n1:2*n1],
              "flow_f2": flows[2*n1:2*n1+npairs_l[2]],
              "flow_b2": flows[2*n1+npairs_l[2]:]}
    for rep in range(2):
        t0 = time.time()
        info = estimate_focal_from_flows(result, H, W, seed=0)
        print(f"selfcal rep{rep}: {time.time()-t0:.1f}s focal={info['focal']:.1f}",
              flush=True)

    # D2H + .flo writes
    from particlesfm_tpu.io import flo as flo_io

    t0 = time.time()
    buf = result["flow_f"].astype(jnp.float16)
    host = np.asarray(buf, np.float32)
    print(f"D2H 1 dir: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    d = Path("/tmp/prof_flo")
    d.mkdir(exist_ok=True)
    for i in range(host.shape[0]):
        flo_io.write_flo(d / f"{i:06d}.flo", host[i])
    print(f"flo write 1 dir: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
