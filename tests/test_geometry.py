"""Geometry kernel unit tests against NumPy/SciPy references."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from particlesfm_tpu.geometry import rotations as rot
from particlesfm_tpu.geometry import se3, cameras, epipolar, triangulation, alignment


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, 64)
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
    # compare with scipy (xyzw order)
    R_ref = ScipyRot.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    q_back = np.asarray(rot.rotmat_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(np.abs(np.sum(q_back * q, axis=-1)), 1.0, atol=1e-5)


def test_angle_axis_roundtrip(rng):
    aa = rng.normal(size=(64, 3))
    aa[0] = 0.0  # degenerate small-angle case
    aa[1] = np.array([1e-8, 0, 0])
    q = np.asarray(rot.angle_axis_to_quat(jnp.asarray(aa)))
    aa_back = np.asarray(rot.quat_to_angle_axis(jnp.asarray(q)))
    R_ref = ScipyRot.from_rotvec(aa).as_matrix()
    R = np.asarray(rot.angle_axis_to_rotmat(jnp.asarray(aa)))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    np.testing.assert_allclose(aa_back, aa, atol=1e-4)


def test_quat_multiply_matches_matrix(rng):
    qa = random_quats(rng, 16)
    qb = random_quats(rng, 16)
    q_ab = np.asarray(rot.quat_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    R_ab = np.asarray(rot.quat_to_rotmat(jnp.asarray(q_ab)))
    R_ref = np.einsum(
        "nij,njk->nik",
        np.asarray(rot.quat_to_rotmat(jnp.asarray(qa))),
        np.asarray(rot.quat_to_rotmat(jnp.asarray(qb))),
    )
    np.testing.assert_allclose(R_ab, R_ref, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    out = np.asarray(rot.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_se3_compose_inverse(rng):
    q1, q2 = random_quats(rng, 8), random_quats(rng, 8)
    t1, t2 = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
    x = rng.normal(size=(8, 3))
    y1 = np.asarray(se3.pose_apply(jnp.asarray(q1), jnp.asarray(t1), jnp.asarray(x)))
    y2 = np.asarray(se3.pose_apply(jnp.asarray(q2), jnp.asarray(t2), jnp.asarray(y1)))
    qc, tc = se3.pose_compose(jnp.asarray(q2), jnp.asarray(t2), jnp.asarray(q1), jnp.asarray(t1))
    y2c = np.asarray(se3.pose_apply(qc, tc, jnp.asarray(x)))
    np.testing.assert_allclose(y2c, y2, atol=1e-4)
    qi, ti = se3.pose_inverse(jnp.asarray(q1), jnp.asarray(t1))
    x_back = np.asarray(se3.pose_apply(qi, ti, jnp.asarray(y1)))
    np.testing.assert_allclose(x_back, x, atol=1e-4)


def test_camera_project_unproject(rng):
    params = jnp.asarray([500.0, 480.0, 320.0, 240.0, 0.05])
    xy = rng.uniform(-0.5, 0.5, size=(100, 2))
    uv = np.asarray(cameras.cam_to_img(params, jnp.asarray(xy, jnp.float32)))
    xy_back = np.asarray(cameras.img_to_cam(params, jnp.asarray(uv), num_iters=20))
    np.testing.assert_allclose(xy_back, xy, atol=1e-4)


def _synthetic_two_view(rng, n=100, noise=0.0):
    X = rng.uniform(-1, 1, size=(n, 3)) + np.array([0, 0, 4.0])
    q1 = np.array([1.0, 0, 0, 0])
    t1 = np.zeros(3)
    q2 = ScipyRot.from_rotvec([0.02, 0.3, 0.01]).as_quat()[[3, 0, 1, 2]]
    t2 = np.array([-0.8, 0.1, 0.05])
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = ScipyRot.from_quat(q2[[1, 2, 3, 0]]).as_matrix() @ X.T + t2[:, None]
    x2 = (Xc2[:2] / Xc2[2:]).T
    x1 += rng.normal(size=x1.shape) * noise
    x2 += rng.normal(size=x2.shape) * noise
    return q1, t1, q2, t2, X, x1, x2


def test_eight_point_and_pose(rng):
    q1, t1, q2, t2, X, x1, x2 = _synthetic_two_view(rng)
    E = epipolar.eight_point(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
    err = np.asarray(epipolar.sampson_error(E, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))
    assert err.max() < 1e-6
    E = epipolar.essential_closest(E)
    q12, t12, votes = epipolar.pose_from_essential(E, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
    assert int(votes) == x1.shape[0]
    # ground-truth relative pose (P1 = identity so P12 = P2)
    ang = rot.quat_geodesic_angle(q12, jnp.asarray(q2, jnp.float32))
    assert float(ang) < 1e-2
    t_dir = np.asarray(t12)
    t_gt = t2 / np.linalg.norm(t2)
    assert np.abs(np.dot(t_dir, t_gt)) > 0.999


def test_triangulation_dlt(rng):
    q1, t1, q2, t2, X, x1, x2 = _synthetic_two_view(rng)
    Xh = np.asarray(
        triangulation.triangulate_two_view(
            jnp.asarray(np.tile(q1, (len(X), 1)), jnp.float32),
            jnp.asarray(np.tile(t1, (len(X), 1)), jnp.float32),
            jnp.asarray(np.tile(q2, (len(X), 1)), jnp.float32),
            jnp.asarray(np.tile(t2, (len(X), 1)), jnp.float32),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
        )
    )
    np.testing.assert_allclose(Xh, X, atol=5e-3)


def test_triangulation_angles():
    centers = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 0, 0]]], jnp.float32)
    X = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    ang = np.degrees(np.asarray(triangulation.triangulation_angles(centers, X, mask)))
    np.testing.assert_allclose(ang, [45.0], atol=0.1)


def test_umeyama_alignment(rng):
    src = rng.normal(size=(50, 3))
    R_gt = ScipyRot.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
    dst = (s_gt * (R_gt @ src.T)).T + t_gt
    s, R, t = alignment.umeyama(src, dst)
    np.testing.assert_allclose(s, s_gt, atol=1e-9)
    np.testing.assert_allclose(R, R_gt, atol=1e-9)
    np.testing.assert_allclose(t, t_gt, atol=1e-9)
    assert alignment.ate_rmse(src, dst) < 1e-9


def test_rpe_zero_for_identical():
    n = 20
    rng = np.random.default_rng(1)
    Rs = ScipyRot.random(n, rng=rng).as_matrix()
    ts = rng.normal(size=(n, 3))
    tr, ro = alignment.rpe(Rs, ts, Rs, ts)
    assert tr < 1e-9 and ro < 1e-4  # arccos near 1 amplifies f64 round-off
