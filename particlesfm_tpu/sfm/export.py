"""Reconstruction export: COLMAP-format model + converted depth/pose/intrinsics.

Mirrors the reference's output contracts:
  - COLMAP sparse model bins (written by gmapper via Reconstruction::Write,
    /root/reference/sfm/gmapper/src/base/reconstruction.cc:798-841);
  - `colmap_outputs_converted/{depths/*.npy+png, poses/*.txt (3x4 world2cam),
    intrinsics/*.txt}` (/root/reference/sfm/convert.py:43-96,98-130).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..io import colmap_model as cm
from .mapper import Reconstruction


def to_colmap_model(
    rec: Reconstruction, image_names: Optional[List[str]] = None
):
    """Convert to COLMAP camera/image/point3D dicts (ids are 1-based)."""
    if image_names is None:
        image_names = [f"{i:06d}.png" for i in range(rec.num_images)]
    f = float(rec.params[0])
    camera = cm.Camera(
        id=1,
        model="SIMPLE_PINHOLE",
        width=rec.width,
        height=rec.height,
        params=np.array([f, float(rec.params[2]), float(rec.params[3])]),
    )

    valid_tracks = np.nonzero(rec.track_valid)[0]
    point_id_of_track = {int(n): int(n) + 1 for n in valid_tracks}

    # per-image keypoint lists
    xys: Dict[int, List[np.ndarray]] = {i: [] for i in range(rec.num_images)}
    pids: Dict[int, List[int]] = {i: [] for i in range(rec.num_images)}
    img_ids_per_point: Dict[int, List[int]] = {int(n): [] for n in valid_tracks}
    p2d_idx_per_point: Dict[int, List[int]] = {int(n): [] for n in valid_tracks}
    for n in valid_tracks:
        slots = np.nonzero(rec.obs_mask[n])[0]
        for k in slots:
            img = int(rec.obs_frame_idx[n, k])
            p2d_idx_per_point[int(n)].append(len(xys[img]))
            img_ids_per_point[int(n)].append(img + 1)
            xys[img].append(rec.obs_uv[n, k])
            pids[img].append(point_id_of_track[int(n)])

    images = {}
    for i in range(rec.num_images):
        if not rec.registered[i]:
            continue
        images[i + 1] = cm.Image(
            id=i + 1,
            qvec=rec.qvec[i].astype(np.float64),
            tvec=rec.tvec[i].astype(np.float64),
            camera_id=1,
            name=image_names[i],
            xys=np.asarray(xys[i], np.float64).reshape(-1, 2),
            point3D_ids=np.asarray(pids[i], np.int64),
        )

    points3D = {}
    for n in valid_tracks:
        err = rec.obs_error[n, rec.obs_mask[n]]
        points3D[int(n) + 1] = cm.Point3D(
            id=int(n) + 1,
            xyz=rec.points[n].astype(np.float64),
            rgb=np.array([128, 128, 128], np.uint8),
            error=float(err.mean()) if len(err) else 0.0,
            image_ids=np.asarray(img_ids_per_point[int(n)], np.int64),
            point2D_idxs=np.asarray(p2d_idx_per_point[int(n)], np.int64),
        )
    return {1: camera}, images, points3D


def write_colmap_model(rec: Reconstruction, out_dir, image_names=None, binary=True):
    cams, images, points = to_colmap_model(rec, image_names)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if binary:
        cm.write_model_binary(cams, images, points, out)
    else:
        cm.write_model_text(cams, images, points, out)
    return cams, images, points


def write_converted_outputs(
    rec: Reconstruction, out_dir, image_names: Optional[List[str]] = None
) -> None:
    """Depth / pose / intrinsics files in the reference's converted layout."""
    out = Path(out_dir)
    for sub in ("depths", "poses", "intrinsics"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    if image_names is None:
        image_names = [f"{i:06d}" for i in range(rec.num_images)]
    stems = [Path(n).stem for n in image_names]
    f, cx, cy = float(rec.params[0]), float(rec.params[2]), float(rec.params[3])
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]])

    from ..geometry import rotations as rot
    import jax.numpy as jnp

    R_all = np.asarray(rot.quat_to_rotmat(jnp.asarray(rec.qvec)))
    for i in range(rec.num_images):
        if not rec.registered[i]:
            continue
        P = np.concatenate([R_all[i], rec.tvec[i][:, None]], axis=1)  # 3x4 world2cam
        np.savetxt(out / "poses" / f"{stems[i]}.txt", P)
        np.savetxt(out / "intrinsics" / f"{stems[i]}.txt", K)
        # sparse depth: project valid points observed in this image
        depth = np.zeros((rec.height, rec.width), np.float32)
        sel = (rec.obs_frame_idx == i) & rec.obs_mask & rec.track_valid[:, None]
        tracks_n, slots = np.nonzero(sel)
        if len(tracks_n):
            X = rec.points[tracks_n]
            xc = (R_all[i] @ X.T).T + rec.tvec[i]
            z = xc[:, 2]
            u = np.round(f * xc[:, 0] / z + cx).astype(int)
            v = np.round(f * xc[:, 1] / z + cy).astype(int)
            ok = (z > 0) & (u >= 0) & (u < rec.width) & (v >= 0) & (v < rec.height)
            depth[v[ok], u[ok]] = z[ok]
        np.save(out / "depths" / f"{stems[i]}.npy", depth)


def write_nvm(path, rec: "Reconstruction", image_names=None) -> None:
    """VisualSFM NVM export (reconstruction.cc:918-1040 parity): shared-focal
    header, per-image <name> <f> <qw qx qy qz> <cx cy cz> 0 0, then points."""
    import jax.numpy as jnp
    from ..geometry import se3

    if image_names is None:
        image_names = [f"{i:06d}.png" for i in range(rec.num_images)]
    f = float(rec.params[0])
    reg = np.nonzero(rec.registered)[0]
    centers = np.asarray(
        se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec))
    )
    lines = ["NVM_V3", "", str(len(reg))]
    img_order = {int(i): k for k, i in enumerate(reg)}
    for i in reg:
        q = rec.qvec[i]
        c = centers[i]
        lines.append(
            f"{image_names[i]} {f} {q[0]} {q[1]} {q[2]} {q[3]} {c[0]} {c[1]} {c[2]} 0 0"
        )
    valid = np.nonzero(rec.track_valid)[0]
    lines.append("")
    lines.append(str(len(valid)))
    for n in valid:
        x = rec.points[n]
        slots = np.nonzero(rec.obs_mask[n])[0]
        obs = []
        for k in slots:
            img = int(rec.obs_frame_idx[n, k])
            if img in img_order:
                u, v = rec.obs_uv[n, k]
                obs.append(f"{img_order[img]} 0 {u} {v}")
        lines.append(
            f"{x[0]} {x[1]} {x[2]} 128 128 128 {len(obs)} " + " ".join(obs)
        )
    Path(path).write_text("\n".join(lines) + "\n")


def write_bundler(path, rec: "Reconstruction") -> None:
    """Bundler .out export (reconstruction.cc:1042-1140 parity)."""
    import jax.numpy as jnp
    from ..geometry import rotations as rot

    reg = np.nonzero(rec.registered)[0]
    valid = np.nonzero(rec.track_valid)[0]
    f = float(rec.params[0])
    lines = ["# Bundle file v0.3", f"{len(reg)} {len(valid)}"]
    # Bundler convention: y up, z towards viewer -> flip rows 1,2 of [R|t]
    flip = np.diag([1.0, -1.0, -1.0])
    img_order = {int(i): k for k, i in enumerate(reg)}
    for i in reg:
        R = np.asarray(rot.quat_to_rotmat(jnp.asarray(rec.qvec[i], jnp.float32)))
        Rb = flip @ R
        tb = flip @ rec.tvec[i]
        lines.append(f"{f} 0 0")
        for row in Rb:
            lines.append(f"{row[0]} {row[1]} {row[2]}")
        lines.append(f"{tb[0]} {tb[1]} {tb[2]}")
    for n in valid:
        x = rec.points[n]
        lines.append(f"{x[0]} {x[1]} {x[2]}")
        lines.append("128 128 128")
        slots = np.nonzero(rec.obs_mask[n])[0]
        obs = []
        for k in slots:
            img = int(rec.obs_frame_idx[n, k])
            if img in img_order:
                u, v = rec.obs_uv[n, k]
                obs.append(f"{img_order[img]} 0 {u} {v}")
        lines.append(f"{len(obs)} " + " ".join(obs))
    Path(path).write_text("\n".join(lines) + "\n")


def write_vrml(path, rec: "Reconstruction", colors=None) -> None:
    """Minimal VRML 2.0 point-cloud export (reconstruction.cc:1142-1219 parity)."""
    pts = rec.points[rec.track_valid]
    cols = (
        colors[rec.track_valid] / 255.0
        if colors is not None
        else np.full((len(pts), 3), 0.8)
    )
    lines = ["#VRML V2.0 utf8", "Shape { geometry PointSet {", "coord Coordinate { point ["]
    lines += [f"{p[0]} {p[1]} {p[2]}," for p in pts]
    lines += ["] }", "color Color { color ["]
    lines += [f"{c[0]:.3f} {c[1]:.3f} {c[2]:.3f}," for c in cols]
    lines += ["] } } }"]
    Path(path).write_text("\n".join(lines) + "\n")
