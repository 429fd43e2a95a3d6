"""Run the real flow_stage twice in-process with timestamped logs (dev tool)."""
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from particlesfm_tpu.pipeline import stages
    from particlesfm_tpu.pipeline.run import (_load_raft_apply,
                                              config_from_args,
                                              build_arg_parser,
                                              load_image_stack)

    img_dir = Path("data/acc13/seqs/seq_01_dyn/images")
    images, _ = load_image_stack(img_dir)
    cfg = config_from_args(build_arg_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", "/tmp/prof_flow_out"]))

    t0 = time.time()

    def log(*a):
        print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)

    raft_apply = _load_raft_apply(cfg)
    log("ckpt loaded")
    for rep in range(2):
        out = Path(f"/tmp/prof_flow_out")
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        tr = time.time()
        stages.flow_stage(images, out, cfg, raft_apply, log=log)
        log(f"flow_stage rep{rep}: {time.time()-tr:.1f}s")


if __name__ == "__main__":
    main()
