"""Micro-profile the selfcal pieces on real flow fields (dev tool)."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def t(label, fn, *a, **k):
    import jax

    t0 = time.time()
    out = fn(*a, **k)
    out = jax.block_until_ready(out)
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from particlesfm_tpu.io import flo as flo_io

    root = Path("/tmp/bench_out/optical_flows")
    flows = {}
    for name in ("flow_f", "flow_b"):
        files = sorted((root / name).glob("*.flo"))
        flows[name] = np.stack([flo_io.read_flo(p) for p in files])
    print("loaded", {k: v.shape for k, v in flows.items()}, flush=True)
    H, W = flows["flow_f"].shape[1:3]

    from particlesfm_tpu.ops.sampling import bilinear_sample

    rng = np.random.default_rng(0)
    grid = np.stack(np.meshgrid(np.arange(24, W - 24, 10),
                                np.arange(24, H - 24, 10)), -1).reshape(-1, 2)
    grid = grid[rng.choice(len(grid), 2048, replace=False)].astype(np.float32)

    ff = jnp.asarray(flows["flow_f"])
    fb = jnp.asarray(flows["flow_b"])
    T = ff.shape[0]
    samp_b = jax.jit(jax.vmap(bilinear_sample))

    uv1s, uv2s, oks = [], [], []
    for K in (2, 4):
        nw = T - K + 1
        t0s = np.arange(nw)
        p = jnp.broadcast_to(jnp.asarray(grid), (nw,) + grid.shape)
        ok = jnp.ones((nw, len(grid)), bool)
        tK = time.time()
        for k in range(K):
            f = samp_b(ff[t0s + k], p)
            pn = p + f
            b = samp_b(fb[t0s + k], pn)
            err = jnp.linalg.norm(f + b, axis=-1)
            ok &= ((err < 0.5) & (pn[..., 0] > 4) & (pn[..., 0] < W - 4)
                   & (pn[..., 1] > 4) & (pn[..., 1] < H - 4))
            p = pn
        jax.block_until_ready(p)
        print(f"compose K={K}: {time.time()-tK:.2f}s", flush=True)
        uv1s.append(np.broadcast_to(grid, (nw,) + grid.shape))
        uv2s.append(np.asarray(p))
        oks.append(np.asarray(ok))
    uv1 = jnp.asarray(np.concatenate(uv1s))
    uv2 = jnp.asarray(np.concatenate(uv2s))
    ok = jnp.asarray(np.concatenate(oks))
    print("P,M =", uv1.shape[:2], flush=True)

    from particlesfm_tpu.globalsfm.selfcal import (estimate_fundamentals,
                                                   focal_cost_curves)
    from particlesfm_tpu.geometry.homography import (homography_ransac,
                                                     symmetric_transfer_error)

    key = jax.random.PRNGKey(0)
    for rep in range(2):
        fr = t(f"estimate_fundamentals rep{rep}", estimate_fundamentals,
               key, uv1, uv2, ok, 4.0, 64)
    f_grid = jnp.exp(jnp.linspace(jnp.log(0.3 * W), jnp.log(3.0 * W), 96))
    pp = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    jcurves = jax.jit(focal_cost_curves)
    for rep in range(2):
        t(f"focal_cost_curves rep{rep}", jcurves, fr.F, pp,
          f_grid.astype(jnp.float32))
    for rep in range(2):
        t(f"homography_ransac rep{rep}", homography_ransac, key, uv1, uv2, ok,
          jnp.full(uv1.shape[0], 4.0, jnp.float32), num_hypotheses=32)


if __name__ == "__main__":
    main()
