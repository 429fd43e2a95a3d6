"""Golden-value tests for the global SfM solvers on synthetic scenes.

Strategy per SURVEY.md §4: known poses -> synthetic observations -> each solver must
recover the ground truth (up to the appropriate gauge) well beyond the tolerance
the real pipeline needs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.geometry import rotations as rot
from particlesfm_tpu.geometry import se3
from particlesfm_tpu.globalsfm import (
    estimate_relative_poses,
    average_rotations,
    refine_pairwise_translations,
    estimate_positions_lud,
    triangulate_tracks,
    filter_observations,
    bundle_adjust,
)
from particlesfm_tpu.globalsfm.ba import default_free_masks, refine_shared_focal
from particlesfm_tpu.globalsfm.tracks3d import TrackObs
from particlesfm_tpu.globalsfm.translation import directions_from_relative_poses


def make_scene(num_views=8, num_points=300, seed=0, height=480, width=640):
    """Cameras on an arc looking at a point cloud near the origin."""
    rng = np.random.default_rng(seed)
    f = 500.0
    params = np.array([f, f, width / 2, height / 2, 0.0], np.float32)
    # camera centers on an arc
    angles = np.linspace(-0.45, 0.45, num_views)
    centers = np.stack(
        [4.0 * np.sin(angles), 0.25 * np.sin(3 * angles), -4.0 * np.cos(angles)], axis=1
    )
    # look at origin: z_cam = normalize(-center)
    qs, ts = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)  # world->cam rows
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(R)))
        t = -R @ c
        qs.append(q)
        ts.append(t)
    q = np.stack(qs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)
    X = rng.uniform([-1.5, -1.0, -1.0], [1.5, 1.0, 1.0], (num_points, 3)).astype(np.float32)
    # project to all views
    x_cam = np.asarray(se3.pose_apply(q[:, None], t[:, None], X[None]))  # [V,N,3]
    uv = np.stack(
        [
            f * x_cam[..., 0] / x_cam[..., 2] + params[2],
            f * x_cam[..., 1] / x_cam[..., 2] + params[3],
        ],
        axis=-1,
    ).astype(np.float32)
    in_img = (
        (uv[..., 0] > 0) & (uv[..., 0] < width) & (uv[..., 1] > 0) & (uv[..., 1] < height)
        & (x_cam[..., 2] > 0.1)
    )
    return dict(q=q, t=t, X=X, uv=uv, vis=in_img, params=params, centers=centers)


def normalized(uv, params):
    return (uv - params[2:4]) / params[0]


def all_pairs(V):
    return np.array([(i, j) for i in range(V) for j in range(i + 1, V)], np.int32)


def rel_pose(q, t, i, j):
    qi, ti = se3.pose_inverse(q[i], t[i])
    return se3.pose_compose(q[j], t[j], qi, ti)


class TestTwoView:
    def test_recovers_relative_pose(self):
        sc = make_scene()
        pairs = np.array([[0, 4], [1, 5], [2, 7]], np.int32)
        M = 150
        rng = np.random.default_rng(1)
        x1_list, x2_list, mask_list = [], [], []
        for i, j in pairs:
            vis = sc["vis"][i] & sc["vis"][j]
            idx = rng.choice(np.nonzero(vis)[0], M, replace=True)
            n1 = normalized(sc["uv"][i, idx], sc["params"])
            n2 = normalized(sc["uv"][j, idx], sc["params"])
            # 10% outliers
            out = rng.random(M) < 0.1
            n2 = np.where(out[:, None], rng.uniform(-0.5, 0.5, (M, 2)), n2)
            x1_list.append(n1)
            x2_list.append(n2)
            mask_list.append(np.ones(M, bool))
        thres = np.full(len(pairs), (4.0 / 500.0) ** 2, np.float32)
        res = estimate_relative_poses(
            jax.random.PRNGKey(0),
            jnp.asarray(np.stack(x1_list), jnp.float32),
            jnp.asarray(np.stack(x2_list), jnp.float32),
            jnp.asarray(np.stack(mask_list)),
            jnp.asarray(thres),
            num_hypotheses=64,
        )
        for k, (i, j) in enumerate(pairs):
            q_gt, t_gt = rel_pose(sc["q"], sc["t"], i, j)
            ang = np.degrees(float(rot.quat_geodesic_angle(res.q_rel[k], q_gt)))
            assert ang < 1.0, f"pair {i},{j}: rotation error {ang} deg"
            t_dir = np.asarray(res.t_rel[k])
            t_gt = np.asarray(t_gt)
            t_gt = t_gt / np.linalg.norm(t_gt)
            cos = abs(float(t_dir @ t_gt))
            assert cos > 0.999, f"pair {i},{j}: translation direction cos {cos}"
            assert int(res.num_inliers[k]) > 100


class TestRotationAveraging:
    def test_recovers_rotations_with_outliers(self):
        sc = make_scene(num_views=10)
        V = 10
        pairs = all_pairs(V)
        rng = np.random.default_rng(2)
        R_abs = np.asarray(rot.quat_to_rotmat(jnp.asarray(sc["q"])))
        R_rel = []
        for i, j in pairs:
            Rij = R_abs[j] @ R_abs[i].T
            # small noise
            noise = rot.angle_axis_to_rotmat(jnp.asarray(rng.normal(0, 0.005, 3), jnp.float32))
            R_rel.append(np.asarray(noise) @ Rij)
        R_rel = np.stack(R_rel).astype(np.float32)
        # 15% outliers: random rotations
        nout = int(0.15 * len(pairs))
        out_idx = rng.choice(len(pairs), nout, replace=False)
        for k in out_idx:
            R_rel[k] = np.asarray(
                rot.angle_axis_to_rotmat(jnp.asarray(rng.normal(0, 1.5, 3), jnp.float32))
            )
        # init: identity everywhere except view 0 pinned at gt for gauge comparison
        R_init = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
        R_init[0] = R_abs[0]
        R_est, rinfo = average_rotations(
            V,
            jnp.asarray(pairs),
            jnp.asarray(R_rel),
            jnp.asarray(R_init),
            jnp.ones(len(pairs), jnp.float32),
        )
        assert float(rinfo["median_residual_rad"]) < np.radians(0.5)
        # compare in gauge-free way: relative rotations between all view pairs
        R_est = np.asarray(R_est)
        errs = []
        for i, j in pairs:
            Rij_gt = R_abs[j] @ R_abs[i].T
            Rij_est = R_est[j] @ R_est[i].T
            a = np.degrees(
                float(rot.rotation_geodesic_angle(jnp.asarray(Rij_est), jnp.asarray(Rij_gt)))
            )
            errs.append(a)
        assert np.median(errs) < 1.0, f"median rel-rotation error {np.median(errs)} deg"


class TestTranslation:
    def test_pairwise_refinement(self):
        sc = make_scene()
        pairs = all_pairs(8)
        M = 100
        rng = np.random.default_rng(3)
        x1 = np.zeros((len(pairs), M, 2), np.float32)
        x2 = np.zeros((len(pairs), M, 2), np.float32)
        mask = np.zeros((len(pairs), M), bool)
        for k, (i, j) in enumerate(pairs):
            vis = sc["vis"][i] & sc["vis"][j]
            idx = rng.choice(np.nonzero(vis)[0], M, replace=True)
            x1[k] = normalized(sc["uv"][i, idx], sc["params"])
            x2[k] = normalized(sc["uv"][j, idx], sc["params"])
            mask[k] = True
        R_abs = np.asarray(rot.quat_to_rotmat(jnp.asarray(sc["q"])))
        w0 = rng.normal(size=(len(pairs), 3)).astype(np.float32)
        w0 /= np.linalg.norm(w0, axis=1, keepdims=True)
        w = refine_pairwise_translations(
            jnp.asarray(pairs), jnp.asarray(R_abs), jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(mask), jnp.asarray(w0),
        )
        w = np.asarray(w)
        for k, (i, j) in enumerate(pairs):
            gt = sc["centers"][i] - sc["centers"][j]
            gt = gt / np.linalg.norm(gt)
            cos = float(w[k] @ gt)
            assert cos > 0.999, f"pair {i},{j}: direction cos {cos}"

    def test_lud_positions(self):
        sc = make_scene(num_views=8)
        pairs = all_pairs(8)
        centers = sc["centers"]
        w = centers[pairs[:, 0]] - centers[pairs[:, 1]]
        w = (w / np.linalg.norm(w, axis=1, keepdims=True)).astype(np.float32)
        p, s, info = estimate_positions_lud(
            8, jnp.asarray(pairs), jnp.asarray(w), jnp.ones(len(pairs), jnp.float32)
        )
        # convergence telemetry: terminated before the cap with small residuals
        assert int(info["iters"]) < 2000
        assert float(info["r_primal"]) < 1e-2
        p = np.asarray(p)
        # align: positions recovered up to similarity (scale + translation; rotation
        # is fixed because directions are in world frame)
        gt = centers - centers[0]
        scale = np.sum(p * gt) / max(np.sum(p * p), 1e-12)
        err = np.linalg.norm(scale * p - gt, axis=1)
        rel = err / np.abs(scale) / np.linalg.norm(gt, axis=1).max()
        assert rel.max() < 0.02, f"relative position error {rel.max()}"


def build_obs(sc, K=8, seed=0):
    """TrackObs from the synthetic scene: each point observed in K sampled views."""
    rng = np.random.default_rng(seed)
    V, N = sc["vis"].shape
    frame_idx = np.zeros((N, K), np.int32)
    uv = np.zeros((N, K, 2), np.float32)
    mask = np.zeros((N, K), bool)
    for n in range(N):
        views = np.nonzero(sc["vis"][:, n])[0]
        k = min(K, len(views))
        sel = rng.choice(views, k, replace=False)
        frame_idx[n, :k] = sel
        uv[n, :k] = sc["uv"][sel, n]
        mask[n, :k] = True
    return TrackObs(jnp.asarray(frame_idx), jnp.asarray(uv), jnp.asarray(mask))


class TestTriangulation:
    def test_triangulate_and_gate(self):
        sc = make_scene()
        obs = build_obs(sc)
        X = triangulate_tracks(
            jnp.asarray(sc["q"]), jnp.asarray(sc["t"]), jnp.asarray(sc["params"]), obs
        )
        err = np.linalg.norm(np.asarray(X) - sc["X"], axis=1)
        assert np.median(err) < 1e-3
        good, valid, errs = filter_observations(
            jnp.asarray(sc["q"]), jnp.asarray(sc["t"]), jnp.asarray(sc["params"]),
            X, obs,
        )
        assert bool(jnp.mean(valid.astype(jnp.float32)) > 0.95)
        assert float(jnp.max(jnp.where(obs.mask, errs, 0.0))) < 1.0


class TestBundleAdjustment:
    def test_recovers_from_perturbation(self):
        sc = make_scene(num_views=8, num_points=200)
        obs = build_obs(sc)
        rng = np.random.default_rng(4)
        q0 = sc["q"].copy()
        t0 = sc["t"] + rng.normal(0, 0.02, sc["t"].shape).astype(np.float32)
        dq = np.asarray(
            rot.angle_axis_to_quat(jnp.asarray(rng.normal(0, 0.01, (8, 3)), jnp.float32))
        )
        q0 = np.array(rot.quat_multiply(jnp.asarray(dq), jnp.asarray(q0)))
        # keep the gauge views at ground truth so the comparison is gauge-free
        q0[0], t0[0] = sc["q"][0], sc["t"][0]
        t0[1, 0] = sc["t"][1, 0]
        X0 = sc["X"] + rng.normal(0, 0.05, sc["X"].shape).astype(np.float32)

        state = bundle_adjust(
            jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(sc["params"]),
            jnp.asarray(X0), obs,
            default_free_masks(8),
            jnp.ones(200, jnp.float32),
            max_iterations=25,
        )
        _, _, errs = filter_observations(
            state.q, state.t, jnp.asarray(sc["params"]), state.X, obs
        )
        mean_err = float(jnp.sum(jnp.where(obs.mask, errs, 0.0)) / jnp.sum(obs.mask))
        assert mean_err < 0.05, f"mean reprojection error after BA: {mean_err}px"
        for i in range(8):
            ang = np.degrees(float(rot.quat_geodesic_angle(state.q[i], jnp.asarray(sc["q"][i]))))
            assert ang < 0.1, f"view {i} rotation off by {ang} deg"

    def test_focal_refinement(self):
        sc = make_scene()
        obs = build_obs(sc)
        bad = sc["params"].copy()
        bad[0] = bad[1] = 450.0
        new_params = refine_shared_focal(
            jnp.asarray(sc["q"]), jnp.asarray(sc["t"]), jnp.asarray(bad),
            jnp.asarray(sc["X"]), obs, jnp.ones(sc["X"].shape[0], jnp.float32),
        )
        assert abs(float(new_params[0]) - 500.0) < 0.5
