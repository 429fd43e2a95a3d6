"""Global bundle adjustment: Levenberg-Marquardt with Schur-complement PCG.

TPU-native rebuild of the reference's Ceres sparse-Schur BA
(/root/reference/sfm/gmapper/src/optim/bundle_adjustment.cc:259-321 — SOFT_L1 loss,
quaternion parameterization, constant-rotation mode, 7-DoF gauge fixed by pinning
image0's pose and image1's tvec x, global_mapper.cc:402-448). The design maps the
sparse problem onto dense batched blocks:

  - residuals/Jacobians: one fused elementwise+matmul pass over the padded
    observation tensor [N, K] (N tracks x K obs slots) — no per-residual-block
    object graph;
  - robustification: soft-L1 as IRLS weights (rho'(z) = 1/sqrt(1+z));
  - point elimination: per-track 3x3 Schur blocks, inverted in parallel (vmap);
  - reduced camera system: matrix-free PCG with block-Jacobi preconditioner;
    the matvec is gather -> small matmuls -> segment-sum, which XLA fuses into a
    few kernels. Camera blocks shard over the device mesh and the PCG reductions
    become psum collectives (parallel/ wires the shardings in).
  - gauge and constant-rotation ("translation-only" first phase,
    controllers/global_mapper.cc:177) are per-parameter masks, not problem
    restructuring.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot
from ..geometry import se3
from .tracks3d import TrackObs


class BAState(NamedTuple):
    q: jnp.ndarray        # [V, 4]
    t: jnp.ndarray        # [V, 3]
    X: jnp.ndarray        # [N, 3]
    params: jnp.ndarray   # [5] shared intrinsics (focal possibly refined)
    cost: jnp.ndarray     # scalar robust cost
    lam: jnp.ndarray      # final LM damping
    iters: jnp.ndarray    # LM iterations actually run (early-exit telemetry)


def _residuals_jacobians(q, t, params, X, obs: TrackObs, w_obs):
    """Per-observation residuals r [N,K,2], J_cam [N,K,2,6], J_pt [N,K,2,3].

    Pose tangent d = (omega, nu): R <- Exp(omega) R, t <- t + nu.
    Intrinsics: canonical row (fx, fy, cx, cy, k) with k ignored (the pipeline's
    shared camera is SIMPLE_PINHOLE, import_feature_matches.py:36-65).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    qo = q[obs.frame_idx]
    to = t[obs.frame_idx]
    x_cam = se3.pose_apply(qo, to, X[:, None, :])          # [N, K, 3]
    x, y, z = x_cam[..., 0], x_cam[..., 1], x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * x / z_safe + cx
    v = fy * y / z_safe + cy
    r = jnp.stack([u, v], axis=-1) - obs.uv                # [N, K, 2]

    iz = 1.0 / z_safe
    zero = jnp.zeros_like(x)
    A = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz * iz], -1),
            jnp.stack([zero, fy * iz, -fy * y * iz * iz], -1),
        ],
        axis=-2,
    )                                                      # [N, K, 2, 3]
    RX = x_cam - to                                        # R @ X
    J_rot = jnp.einsum("nkij,nkjl->nkil", A, -rot.skew(RX))
    J_cam = jnp.concatenate([J_rot, A], axis=-1)           # [N, K, 2, 6]
    Ro = rot.quat_to_rotmat(qo)
    J_pt = jnp.einsum("nkij,nkjl->nkil", A, Ro)
    # shared-focal column (fx = fy = f tied): dr/df = (x/z, y/z)
    J_f = jnp.stack([x / z_safe, y / z_safe], axis=-1)     # [N, K, 2]
    sw = jnp.sqrt(w_obs)[..., None]
    return r * sw, J_cam * sw[..., None], J_pt * sw[..., None], J_f * sw


def _robust_weights(q, t, params, X, obs: TrackObs, loss_scale, use_soft_l1: bool,
                    pm=None):
    """IRLS weights + robust cost. `pm` ([N, 1] point mask) gates observations of
    tracks excluded from the solve out of BOTH the weights and the cost, so the
    LM accept/reject decision only sees residuals the step actually optimizes."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    qo = q[obs.frame_idx]
    to = t[obs.frame_idx]
    x_cam = se3.pose_apply(qo, to, X[:, None, :])
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * x_cam[..., 0] / z_safe + cx
    v = fy * x_cam[..., 1] / z_safe + cy
    r2 = (u - obs.uv[..., 0]) ** 2 + (v - obs.uv[..., 1]) ** 2
    # non-finite residuals (overflowed projections of junk points) would turn
    # the masked cost sum into NaN (inf * 0-weight); clamp to a huge finite
    # value so soft-L1 just assigns them ~zero weight
    r2 = jnp.nan_to_num(r2, nan=1e20, posinf=1e20)
    m = obs.mask.astype(r2.dtype)
    if pm is not None:
        m = m * pm
    if use_soft_l1:
        w = m / jnp.sqrt(1.0 + r2 / (loss_scale * loss_scale))
    else:
        w = m
    # robust cost for LM accept/reject
    s2 = loss_scale * loss_scale
    rho = jnp.where(
        use_soft_l1, 2.0 * s2 * (jnp.sqrt(1.0 + r2 / s2) - 1.0), r2
    )
    cost = jnp.sum(rho * m)
    return w, cost


def _inv3(M):
    """Batched closed-form 3x3 inverse (adjugate), [..., 3, 3]."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def default_free_masks(num_views: int, refine_rotation: bool = True,
                       anchor=(0, 1)):
    """Gauge fixing per global_mapper.cc:430-435: pin one view's full pose and
    one component of a second view's tvec; optionally freeze all rotations
    (first BA phase). `anchor` selects WHICH views are pinned: the reference
    pins views (0, 1), but pinning locks their initial estimates in — when
    rotation averaging mis-estimates exactly those views, BA can never
    recover them (round-4 seq_12 failure: anchors 155 deg off, everything
    else correct). The mapper passes its two highest-support views instead.
    An optional third anchor entry selects WHICH tvec component of a1 is
    pinned (default x): pinning a near-zero component leaves the scale gauge
    near-singular — the mapper passes the dominant component of a1's initial
    tvec."""
    a0, a1 = int(anchor[0]), int(anchor[1])
    comp = int(anchor[2]) if len(anchor) > 2 else 0
    free = jnp.ones((num_views, 6), jnp.float32)
    free = free.at[a0].set(0.0)
    free = free.at[a1, 3 + comp].set(0.0)
    if not refine_rotation:
        free = free.at[:, :3].set(0.0)
    return free


def _bundle_adjust_impl(
    q: jnp.ndarray,           # [V, 4]
    t: jnp.ndarray,           # [V, 3]
    params: jnp.ndarray,      # [5] shared intrinsics
    X: jnp.ndarray,           # [N, 3]
    obs: TrackObs,            # mask already gated (invalid obs/tracks masked out)
    free_mask: jnp.ndarray,   # [V, 6] 1.0 = free parameter
    point_mask: jnp.ndarray,  # [N] 1.0 = optimize this track
    max_iterations: int = 30,
    pcg_iters: int = 50,
    loss_scale: float = 1.0,
    use_soft_l1: bool = True,
    init_lam: float = 1e-4,
    refine_focal: bool = False,
    solver: str = "dense",
    function_tolerance: float = 1e-6,
    focal_bounds: Optional[jnp.ndarray] = None,   # [2] trust region for f
    reduce_fn=None,
) -> BAState:
    """LM bundle adjustment; optionally solves the shared focal length jointly.

    The focal enters the reduced system as a single bordered scalar column
    (Ceres handles it as a shared intrinsics block; the border blocks S_cf [V,6]
    and S_ff are tiny and formed explicitly).

    solver="dense": the reduced camera system (6V+1 square) is assembled
    explicitly and solved by dense Cholesky — exact, one MXU-friendly solve;
    right up to ~2k cameras this is both faster and more accurate in f32 than
    truncated PCG (this problem class has <= a few hundred cameras per scene).
    solver="pcg": matrix-free Schur PCG with block-Jacobi preconditioning.

    `reduce_fn` completes cross-TRACK reductions: identity on one device; under
    shard_map with the track axis sharded it is a psum over the mesh axis
    (parallel/sharded_ba.py). Point blocks stay device-local; only the tiny
    reduced camera-system pieces ([V,6,6]-scale) ride the collectives — the
    sparse-Schur communication pattern the reference's Ceres gets from shared
    memory. GSPMD alone mis-lowers the chunked Schur assembly (the dynamic
    slices over the sharded track axis force all-gathers), hence the explicit
    formulation.
    """
    R = reduce_fn if reduce_fn is not None else (lambda x: x)
    V = q.shape[0]
    fidx = obs.frame_idx
    pm = point_mask[:, None].astype(X.dtype)
    fm = free_mask
    f_free = 1.0 if refine_focal else 0.0

    # On TPU, scatter-adds serialize; for small camera counts every block
    # accumulation becomes a one-hot contraction on the MXU instead (the
    # segment-sum-as-matmul trick). Large V falls back to scatters.
    use_onehot = solver == "dense" and V <= 192

    def lm_step(carry, _):
        q, t, X, params, lam = carry
        w_obs, cost0 = _robust_weights(q, t, params, X, obs, loss_scale, use_soft_l1, pm)
        cost0 = R(cost0)
        r, Jc, Jp, Jf = _residuals_jacobians(q, t, params, X, obs, w_obs)

        # --- assemble blocks -------------------------------------------------
        if use_onehot:
            oh = jax.nn.one_hot(fidx, V, dtype=X.dtype)    # [N, K, V]
            Hcc = R(jnp.einsum("nkv,nkri,nkrj->vij", oh, Jc, Jc))
            gc = R(jnp.einsum("nkv,nkri,nkr->vi", oh, Jc, r))
            Hcf = R(jnp.einsum("nkv,nkri,nkr->vi", oh, Jc, Jf))
        else:
            Hcc = R(jnp.zeros((V, 6, 6), X.dtype).at[fidx].add(
                jnp.einsum("nkri,nkrj->nkij", Jc, Jc)
            ))
            gc = R(jnp.zeros((V, 6), X.dtype).at[fidx].add(
                jnp.einsum("nkri,nkr->nki", Jc, r)
            ))
            Hcf = R(jnp.zeros((V, 6), X.dtype).at[fidx].add(
                jnp.einsum("nkri,nkr->nki", Jc, Jf)
            ))
        Hpp = jnp.einsum("nkri,nkrj->nij", Jp, Jp)
        gp = jnp.einsum("nkri,nkr->ni", Jp, r)
        Wcp = jnp.einsum("nkri,nkrj->nkij", Jc, Jp)        # [N, K, 6, 3]
        # focal border blocks
        Hff = R(jnp.sum(Jf * Jf))
        gf = R(jnp.sum(Jf * r))
        Wfp = jnp.einsum("nkr,nkrj->nj", Jf, Jp)           # [N, 3]

        # LM damping
        dHcc = Hcc + lam * jnp.eye(6, dtype=X.dtype)
        dHpp = Hpp + lam * jnp.eye(3, dtype=X.dtype)
        dHff = Hff + lam
        Hpp_inv = _inv3(dHpp)                              # [N, 3, 3]

        # Schur border terms (explicit, tiny): S_cf, S_ff
        HpiWfp = jnp.einsum("nij,nj->ni", Hpp_inv, Wfp)    # [N, 3]
        if use_onehot:
            S_cf = Hcf - R(jnp.einsum("nkv,nkij,nj->vi", oh, Wcp, HpiWfp))
        else:
            S_cf = Hcf - R(jnp.zeros((V, 6), X.dtype).at[fidx].add(
                jnp.einsum("nkij,nj->nki", Wcp, HpiWfp)
            ))
        S_cf = S_cf * fm * f_free
        S_ff = (dHff - R(jnp.sum(Wfp * HpiWfp))) * f_free + (1.0 - f_free)

        def schur_matvec(xc, xf):
            xc = xc * fm
            xf = xf * f_free
            y = jnp.einsum("vij,vj->vi", dHcc, xc)
            xg = xc[fidx]                                  # [N, K, 6]
            u = jnp.einsum("nkij,nki->nj", Wcp, xg)        # [N, 3]
            w = jnp.einsum("nij,nj->ni", Hpp_inv, u)
            yk = jnp.einsum("nkij,nj->nki", Wcp, w)
            y = y - R(jnp.zeros((V, 6), X.dtype).at[fidx].add(yk))
            y = y + S_cf * xf
            yf = jnp.sum(S_cf * xc) + S_ff * xf
            return y * fm, yf * f_free

        # rhs = -g + W Hpp^-1 gp (camera and focal rows)
        hp = jnp.einsum("nij,nj->ni", Hpp_inv, gp)
        if use_onehot:
            rhs_c = (-gc + R(jnp.einsum("nkv,nkij,nj->vi", oh, Wcp, hp))) * fm
        else:
            rhs_c = (
                -gc + R(jnp.zeros((V, 6), X.dtype).at[fidx].add(
                    jnp.einsum("nkij,nj->nki", Wcp, hp)
                ))
            ) * fm
        rhs_f = (-gf + R(jnp.sum(Wfp * hp))) * f_free

        if solver == "dense":
            # --- explicit reduced camera system, exact Cholesky solve --------
            # off-diagonal Schur blocks: -sum_n W_{n,k1} Hpp_n^-1 W_{n,k2}^T,
            # assembled in track chunks to bound the intermediates
            K = fidx.shape[1]
            N = fidx.shape[0]
            # chunk bounded by the LOCAL track count: under shard_map each
            # device sees N/devices tracks, and a fixed 2048 chunk would pad
            # small shards up to 4-8x their real work (the round-3 virtual-mesh
            # BA curve regressed to 0.09x largely from this padding)
            CHUNK = min(2048, max(128, N))
            pad = (-N) % CHUNK
            Wcp_p = jnp.pad(Wcp, ((0, pad), (0, 0), (0, 0), (0, 0)))
            Hpi_p = jnp.pad(Hpp_inv, ((0, pad), (0, 0), (0, 0)))
            fidx_p = jnp.pad(fidx, ((0, pad), (0, 0)))
            nch = (N + pad) // CHUNK

            if use_onehot:
                # per-chunk: gather W into per-camera slots with a one-hot
                # contraction, then ONE big matmul forms the chunk's S update
                def add_chunk(S, c):
                    Wc = jax.lax.dynamic_slice_in_dim(Wcp_p, c * CHUNK, CHUNK)
                    Hi = jax.lax.dynamic_slice_in_dim(Hpi_p, c * CHUNK, CHUNK)
                    fc = jax.lax.dynamic_slice_in_dim(fidx_p, c * CHUNK, CHUNK)
                    ohc = jax.nn.one_hot(fc, V, dtype=X.dtype)      # [C, K, V]
                    G = jnp.einsum("nkv,nkij->nvij", ohc, Wc)       # [C, V, 6, 3]
                    GH = jnp.einsum("nvij,njl->nvil", G, Hi)
                    return S - jnp.einsum("nvil,nwjl->vwij", GH, G), None
            else:
                def add_chunk(S, c):
                    Wc = jax.lax.dynamic_slice_in_dim(Wcp_p, c * CHUNK, CHUNK)
                    Hi = jax.lax.dynamic_slice_in_dim(Hpi_p, c * CHUNK, CHUNK)
                    fc = jax.lax.dynamic_slice_in_dim(fidx_p, c * CHUNK, CHUNK)
                    WHi = jnp.einsum("nkij,njl->nkil", Wc, Hi)
                    cross = jnp.einsum("nkil,nmjl->nkmij", WHi, Wc)
                    fi = jnp.broadcast_to(fc[:, :, None], cross.shape[:3])
                    fj = jnp.broadcast_to(fc[:, None, :], cross.shape[:3])
                    return S.at[fi, fj].add(-cross), None

            S, _ = jax.lax.scan(
                add_chunk, jnp.zeros((V, V, 6, 6), X.dtype), jnp.arange(nch)
            )
            S = R(S)
            S = S.at[jnp.arange(V), jnp.arange(V)].add(dHcc)
            Sfull = S.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
            # focal border
            Sfull = jnp.concatenate(
                [Sfull, S_cf.reshape(6 * V, 1)], axis=1
            )
            frow = jnp.concatenate([S_cf.reshape(1, 6 * V), S_ff[None, None]], axis=1)
            Sfull = jnp.concatenate([Sfull, frow], axis=0)
            rhs = jnp.concatenate([rhs_c.reshape(6 * V), rhs_f[None]])
            # gauge/constant parameters: identity rows/cols, zero rhs
            free_vec = jnp.concatenate([fm.reshape(6 * V), f_free * jnp.ones((1,), X.dtype)])
            Sfull = Sfull * free_vec[:, None] * free_vec[None, :] + jnp.diag(1.0 - free_vec)
            rhs = rhs * free_vec
            sol = jnp.linalg.solve(Sfull, rhs)
            dc = sol[: 6 * V].reshape(V, 6)
            df = sol[6 * V] * f_free
        else:
            # block-Jacobi preconditioner (+ scalar focal row)
            Minv = jnp.linalg.inv(dHcc + 1e-8 * jnp.eye(6, dtype=X.dtype))
            Sff_inv = 1.0 / jnp.maximum(S_ff, 1e-12)

            def precond(xc, xf):
                return jnp.einsum("vij,vj->vi", Minv, xc) * fm, xf * Sff_inv * f_free

            # --- PCG on the joint (camera, focal) vector ---------------------
            x0 = jnp.zeros((V, 6), X.dtype)
            xf0 = jnp.zeros((), X.dtype)
            Ac, Af = schur_matvec(x0, xf0)
            r0c, r0f = rhs_c - Ac, rhs_f - Af
            z0c, z0f = precond(r0c, r0f)
            rz0 = jnp.sum(r0c * z0c) + r0f * z0f

            def cg_body(c, _):
                xc, xf, rc, rf, zc, zf, pc, pf, rz = c
                Apc, Apf = schur_matvec(pc, pf)
                denom = jnp.sum(pc * Apc) + pf * Apf
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
                xc = xc + alpha * pc
                xf = xf + alpha * pf
                rc = rc - alpha * Apc
                rf = rf - alpha * Apf
                zc, zf = precond(rc, rf)
                rz_new = jnp.sum(rc * zc) + rf * zf
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                pc = zc + beta * pc
                pf = zf + beta * pf
                return (xc, xf, rc, rf, zc, zf, pc, pf, rz_new), None

            (dc, df, *_), _ = jax.lax.scan(
                cg_body, (x0, xf0, r0c, r0f, z0c, z0f, z0c, z0f, rz0), None,
                length=pcg_iters,
            )
            df = df * f_free

        if refine_focal and focal_bounds is not None:
            # focal trust region: the flow self-calibration prior measures f
            # to 1-3% (DESIGN round-4); letting the joint solve walk 2x away
            # from it only ever happened on structured-bias data and always
            # made the metric geometry worse. Clamp the STEP so the solve
            # fine-tunes within the bounds but cannot run away. Clamp BEFORE
            # the point back-substitution so the candidate step stays
            # internally consistent, and only when focal is actually refined —
            # with refine_focal=False df is identically 0 and clamping would
            # manufacture a focal step from an out-of-bounds incoming prior
            # (e.g. the glomap path's jointly-estimated focal).
            df = jnp.clip(params[0] + df, focal_bounds[0],
                          focal_bounds[1]) - params[0]

        # back-substitute points: dp = Hpp^-1 (-gp - Wcp^T dc - Wfp df)
        dcg = dc[fidx]                                     # [N, K, 6]
        wtdc = jnp.einsum("nkij,nki->nj", Wcp, dcg)
        dp = jnp.einsum("nij,nj->ni", Hpp_inv, -gp - wtdc - Wfp * df) * pm

        # --- candidate + accept/reject --------------------------------------
        dq = rot.angle_axis_to_quat(dc[:, :3])
        q_new = rot.quat_normalize(rot.quat_multiply(dq, q))
        t_new = t + dc[:, 3:]
        X_new = X + dp
        params_new = params.at[0].add(df).at[1].add(df)
        _, cost1 = _robust_weights(
            q_new, t_new, params_new, X_new, obs, loss_scale, use_soft_l1, pm
        )
        cost1 = R(cost1)
        accept = cost1 < cost0
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        X = jnp.where(accept, X_new, X)
        params = jnp.where(accept, params_new, params)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), jnp.minimum(lam * 3.0, 1e8))
        return (q, t, X, params, lam), (cost0, cost1)

    # early-terminating LM (Ceres function_tolerance semantics): the
    # refinement loop calls BA ~10 times per scene and every call after the
    # first starts near-converged, so a fixed `max_iterations` scan wastes
    # most of its steps (measured 4.4 s/round at 32k tracks, length=50).
    # Terminate on 2 consecutive ACCEPTED steps with relative improvement
    # < function_tolerance (Ceres default 1e-6, bundle_adjustment.h:48-102;
    # the round-3 hardwired 1e-7 never fired at protocol scale and every
    # round ran the full 50 iterations), or 24 consecutive rejections
    # (lambda re-adaptation exhausted: recovering from the 1e-10 floor to
    # ~1e-2 takes ~19 rejects at x3/step, so a smaller cap cuts live
    # optimizations short — measured as ATE regressions on the orbit tests
    # at a cap of 8).
    rtol = function_tolerance

    def _cond(carry):
        *_, it, stall, rej = carry
        return (it < max_iterations) & (stall < 2) & (rej < 24)

    def _body(carry):
        q, t, X, params, lam, it, stall, rej = carry
        (q, t, X, params, lam), (c0, c1) = lm_step((q, t, X, params, lam), None)
        accepted = c1 < c0
        impr = (c0 - c1) / jnp.maximum(c0, 1e-30)
        stall = jnp.where(accepted, jnp.where(impr < rtol, stall + 1, 0), stall)
        rej = jnp.where(accepted, 0, rej + 1)
        return (q, t, X, params, lam, it + 1, stall, rej)

    (q, t, X, params, lam, n_it, _, _) = jax.lax.while_loop(
        _cond, _body,
        (q, t, X, params, jnp.asarray(init_lam, X.dtype),
         jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32)),
    )
    _, final_cost = _robust_weights(q, t, params, X, obs, loss_scale, use_soft_l1, pm)
    return BAState(q=q, t=t, X=X, params=params, cost=R(final_cost), lam=lam,
                   iters=n_it)


bundle_adjust = partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "pcg_iters", "use_soft_l1", "refine_focal", "solver",
        "function_tolerance",
    ),
)(partial(_bundle_adjust_impl, reduce_fn=None))
bundle_adjust.__doc__ = _bundle_adjust_impl.__doc__


@partial(jax.jit, static_argnames=())
def refine_shared_focal(q, t, params, X, obs: TrackObs, point_mask):
    """Closed-form GN update of the shared focal length (fx = fy = f).

    Mirrors Ceres' refine_focal_length option for the pipeline's single shared
    SIMPLE_PINHOLE camera (bundle_adjustment.h:48-102): with poses and points
    fixed, f minimizing sum ||f*a + c - uv||^2 has a scalar closed form.
    """
    cx, cy = params[2], params[3]
    qo = q[obs.frame_idx]
    to = t[obs.frame_idx]
    x_cam = se3.pose_apply(qo, to, X[:, None, :])
    z = x_cam[..., 2]
    valid = obs.mask & (z > 1e-6) & point_mask[:, None].astype(bool)
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    a = x_cam[..., :2] / z_safe[..., None]                 # [N, K, 2]
    b = obs.uv - jnp.stack([jnp.broadcast_to(cx, z.shape), jnp.broadcast_to(cy, z.shape)], -1)
    w = valid.astype(x_cam.dtype)
    num = jnp.sum(w[..., None] * a * b)
    den = jnp.maximum(jnp.sum(w[..., None] * a * a), 1e-12)
    f = num / den
    return params.at[0].set(f).at[1].set(f)
