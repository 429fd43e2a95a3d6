"""SfM-stage phase attribution: run the real mapper twice on saved tracks (dev)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import numpy as np

    from particlesfm_tpu.sfm.mapper import run_global_mapper
    from particlesfm_tpu.tracks.store import TrackArrays
    from particlesfm_tpu.utils.config import SfmConfig

    tracks_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/tmp/bench_out/trajectories_labeled/tracks.npz")
    tracks = TrackArrays.load(tracks_path)
    print(f"{tracks.num_tracks} tracks x {tracks.num_frames} frames", flush=True)
    H, W = 436, 1024
    import json

    sc = json.loads(Path("/tmp/bench_out/selfcal.json").read_text())
    params = np.asarray([sc["focal"], sc["focal"], W / 2, H / 2, 0.0], np.float32)

    for rep in range(2):
        t0 = time.time()

        def log(*a):
            print(f"[r{rep} {time.time()-t0:7.1f}s]", *a, flush=True)

        rec = run_global_mapper(tracks, H, W, SfmConfig(), params=params.copy(),
                                log=log)
        print(f"rep{rep}: {time.time()-t0:.1f}s registered={rec.num_registered}",
              flush=True)


if __name__ == "__main__":
    main()
