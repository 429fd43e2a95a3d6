"""Sintel data prep — parity with /root/reference/scripts/prepare_sintel.py.

Copies each sequence's frames into <out>/<seq>/images so the pipeline's
--root_dir mode can sweep them.

Usage: python scripts/prepare_sintel.py --sintel_root SINTEL/training/final --out_dir OUT
"""
import argparse
import shutil
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sintel_root", required=True, help="e.g. MPI-Sintel/training/final")
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)
    root = Path(args.sintel_root)
    for seq in sorted(p for p in root.iterdir() if p.is_dir()):
        dst = Path(args.out_dir) / seq.name / "images"
        dst.mkdir(parents=True, exist_ok=True)
        for f in sorted(seq.glob("*.png")):
            shutil.copy(f, dst / f.name)
        print(f"{seq.name}: {len(list(dst.glob('*.png')))} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
