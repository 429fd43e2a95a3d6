"""Physically consistent synthetic flow scenes: height-field + moving camera.

Generates ground-truth optical flow by ray-casting a smooth world surface
z = g(x, y) from known camera poses — every pixel's flow corresponds to a real
static 3D point, so the full pipeline (tracking -> SfM) must recover the camera
trajectory. This is the system-level fixture the verify skill describes.
"""
import numpy as np


def surface(x, y):
    return 0.6 * np.sin(1.3 * x) * np.cos(0.9 * y) + 0.3 * np.sin(2.3 * x + 1.0)


def make_cameras(num_views, step=0.35, height=5.0):
    """World: surface near z=0, cameras at z~height looking straight down."""
    centers = np.stack(
        [step * np.arange(num_views), 0.08 * np.sin(np.arange(num_views)),
         np.full(num_views, height)], axis=1
    )
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])  # world->cam, det=+1
    Rs = np.tile(R, (num_views, 1, 1))
    ts = np.stack([-R @ c for c in centers])
    return Rs, ts, centers


def ray_cast(C, d, iters=25):
    """Solve C + s*d on the surface. C: (3,), d: (..., 3). Returns points (..., 3)."""
    s = (0.0 - C[2]) / d[..., 2]
    for _ in range(iters):
        x = C[0] + s * d[..., 0]
        y = C[1] + s * d[..., 1]
        z = surface(x, y)
        s = (z - C[2]) / d[..., 2]
    return C + s[..., None] * d


def flow_pair(Ra, ta, Rb, tb, K, height, width):
    """GT flow from image a to image b over all pixels, [H, W, 2]."""
    fx, fy, cx, cy = K
    us, vs = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    rays_cam = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us)], -1)
    d = rays_cam @ Ra  # R^T applied to rows
    Ca = -Ra.T @ ta
    X = ray_cast(Ca, d)
    xb = X @ Rb.T + tb
    ub = fx * xb[..., 0] / xb[..., 2] + cx
    vb = fy * xb[..., 1] / xb[..., 2] + cy
    return np.stack([ub - us, vb - vs], -1).astype(np.float32)


def make_flow_scene(num_views=8, height=96, width=128, focal=150.0):
    """Full flow-field scene: all stride-1/2 forward+backward flows + GT poses."""
    Rs, ts, centers = make_cameras(num_views)
    K = (focal, focal, width / 2.0, height / 2.0)
    def pair(a, b):
        return flow_pair(Rs[a], ts[a], Rs[b], ts[b], K, height, width)
    flows = {
        "flow_f": np.stack([pair(i, i + 1) for i in range(num_views - 1)]),
        "flow_b": np.stack([pair(i + 1, i) for i in range(num_views - 1)]),
        "flow_f2": np.stack([pair(i, i + 2) for i in range(num_views - 2)]),
        "flow_b2": np.stack([pair(i + 2, i) for i in range(num_views - 2)]),
    }
    return dict(
        flows=flows, R=Rs, t=ts, centers=centers, K=K,
        height=height, width=width, focal=focal, num_views=num_views,
    )


def make_dynamic_flow_scene(num_views=8, height=96, width=128, focal=150.0,
                            box_size=(28, 36), box_start=(8, 60), box_vel=(3.0, 1.0)):
    """Static scene + a moving box whose flow follows its own velocity.

    The box region's flow is internally forward/backward consistent (so the
    tracker follows it) but inconsistent with ego-motion — exactly the dynamic
    outliers motion segmentation must remove before SfM.
    Returns the static scene dict + 'gt_dynamic' [T, H, W] masks.
    """
    sc = make_flow_scene(num_views, height, width, focal)
    bh, bw = box_size
    masks = np.zeros((num_views, height, width), np.float32)
    for t in range(num_views):
        y0 = int(box_start[0] + t * box_vel[1])
        x0 = int(box_start[1] + t * box_vel[0])
        masks[t, y0 : y0 + bh, x0 : x0 + bw] = 1.0
    for key, stride in (("flow_f", 1), ("flow_b", -1), ("flow_f2", 2), ("flow_b2", -2)):
        flows = sc["flows"][key]
        for i in range(flows.shape[0]):
            a = i if stride > 0 else i + abs(stride)
            d = stride
            in_box = masks[a] > 0.5
            flows[i][in_box] = np.array(
                [box_vel[0] * d, box_vel[1] * d], np.float32
            )
    sc["gt_dynamic"] = masks
    return sc


def make_conditioned_flow_scene(num_views=12, height=192, width=256,
                                focal=240.0, hover=2.0, yaw_step=0.06):
    """Flow scene with camera rotation + strong parallax: the camera flies low
    (hover ~2 -> ~30% relative depth modulation from the surface) and yaws as
    it translates, which conditions focal self-calibration (the default
    make_flow_scene geometry — pure translation over a near-planar surface —
    leaves focal nearly unobservable by design)."""
    centers = np.stack(
        [0.35 * np.arange(num_views), 0.10 * np.sin(np.arange(num_views)),
         np.full(num_views, hover)], axis=1
    )
    base = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    Rs, ts = [], []
    for i, c in enumerate(centers):
        a = yaw_step * (i - num_views / 2.0)
        yaw = np.array([[np.cos(a), -np.sin(a), 0.0],
                        [np.sin(a), np.cos(a), 0.0],
                        [0.0, 0.0, 1.0]])
        tilt_a = 0.25 * np.sin(0.7 * i)
        tilt = np.array([[1.0, 0.0, 0.0],
                         [0.0, np.cos(tilt_a), -np.sin(tilt_a)],
                         [0.0, np.sin(tilt_a), np.cos(tilt_a)]])
        R = tilt @ yaw @ base
        Rs.append(R)
        ts.append(-R @ c)
    Rs = np.stack(Rs)
    ts = np.stack(ts)
    K = (focal, focal, width / 2.0, height / 2.0)

    def pair(a, b):
        return flow_pair(Rs[a], ts[a], Rs[b], tb=ts[b], K=K,
                         height=height, width=width)

    flows = {
        "flow_f": np.stack([pair(i, i + 1) for i in range(num_views - 1)]),
        "flow_b": np.stack([pair(i + 1, i) for i in range(num_views - 1)]),
        "flow_f2": np.stack([pair(i, i + 2) for i in range(num_views - 2)]),
        "flow_b2": np.stack([pair(i + 2, i) for i in range(num_views - 2)]),
    }
    return dict(
        flows=flows, R=Rs, t=ts, centers=centers, K=K,
        height=height, width=width, focal=focal, num_views=num_views,
    )
