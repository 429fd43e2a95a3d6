"""Shared synthetic scene generators for tests: known cameras -> tracks."""
import numpy as np
import jax.numpy as jnp

from particlesfm_tpu.geometry import rotations as rot, se3
from particlesfm_tpu.tracks.store import TrackArrays


def orbit_scene(num_views=12, num_points=400, seed=0, height=480, width=640,
                focal=500.0, pixel_noise=0.0, arc=0.6, radius=5.0):
    """Cameras on an arc looking at a point cloud; returns a dict of gt + tracks."""
    rng = np.random.default_rng(seed)
    params = np.array([focal, focal, width / 2, height / 2, 0.0], np.float32)
    angles = np.linspace(-arc, arc, num_views)
    centers = np.stack(
        [radius * np.sin(angles), 0.3 * np.sin(2 * angles), -radius * np.cos(angles)], 1
    )
    qs, ts = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 0)
        qs.append(np.asarray(rot.rotmat_to_quat(jnp.asarray(R, jnp.float32))))
        ts.append(-R @ c)
    q = np.stack(qs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)
    X = rng.uniform([-2, -1.5, -1.5], [2, 1.5, 1.5], (num_points, 3)).astype(np.float32)
    x_cam = np.asarray(se3.pose_apply(q[:, None], t[:, None], X[None]))
    uv = np.stack(
        [
            focal * x_cam[..., 0] / x_cam[..., 2] + width / 2,
            focal * x_cam[..., 1] / x_cam[..., 2] + height / 2,
        ],
        -1,
    ).astype(np.float32)
    if pixel_noise > 0:
        uv = uv + rng.normal(0, pixel_noise, uv.shape).astype(np.float32)
    vis = (
        (uv[..., 0] > 0) & (uv[..., 0] < width)
        & (uv[..., 1] > 0) & (uv[..., 1] < height)
        & (x_cam[..., 2] > 0.1)
    )
    tracks = TrackArrays(
        xy=np.transpose(uv, (1, 0, 2)).copy(),      # [N, V, 2]
        mask=vis.T.copy(),                          # [N, V]
    )
    return dict(
        q=q, t=t, X=X, uv=uv, vis=vis, params=params, centers=centers,
        tracks=tracks, height=height, width=width, focal=focal,
    )
