"""Flow-stage phase attribution with forced sync at phase boundaries (dev).

Monkeypatches the refine/selfcal entry points with block_until_ready timing
wrappers, then runs the REAL flow_stage twice (rep1 = warm). Inputs differ per
phase call, so the tunnel's apparent result-caching of identical dispatches
cannot fake the numbers.
"""
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from particlesfm_tpu.flow import refine as refine_mod
    from particlesfm_tpu.globalsfm import selfcal as selfcal_mod
    from particlesfm_tpu.pipeline import stages
    from particlesfm_tpu.pipeline.run import (_load_raft_apply,
                                              build_arg_parser,
                                              config_from_args,
                                              load_image_stack)

    acc = {}

    def timed(name, fn, sync=True):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            if sync:
                out = jax.block_until_ready(out)
            acc[name] = acc.get(name, 0.0) + (time.time() - t0)
            return out
        return wrap

    refine_mod.photometric_refine_scheduled = timed(
        "refine", refine_mod.photometric_refine_scheduled)
    selfcal_mod.estimate_focal_from_flows = timed(
        "selfcal", selfcal_mod.estimate_focal_from_flows, sync=False)
    # stages.py imports the names inside functions, so patching the module
    # attributes is enough

    img_dir = Path("data/acc13/seqs/seq_01_dyn/images")
    images, _ = load_image_stack(img_dir)
    cfg = config_from_args(build_arg_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", "/tmp/prof_flow_out"]))
    raft_apply = _load_raft_apply(cfg)

    for rep in range(2):
        acc.clear()
        out = Path("/tmp/prof_flow_out")
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        t0 = time.time()
        stages.flow_stage(images, out, cfg, raft_apply, log=lambda *a: None)
        total = time.time() - t0
        other = total - sum(acc.values())
        print(f"rep{rep}: total={total:.1f}s " +
              " ".join(f"{k}={v:.1f}s" for k, v in acc.items()) +
              f" other={other:.1f}s", flush=True)


if __name__ == "__main__":
    main()
