"""Batched, masked, functional Kalman filter bank.

TPU-native re-design of the reference's per-track Kalman filters
(boxmot/motion/kalman_filters/base.py:234-551 and the XYAH/XYWH/XYSR/
XYHR/XYSCR subclasses): instead of one Python object per track doing
scipy linear algebra on the host, the whole track bank lives in fixed
capacity arrays — mean (K, dx), cov (K, dx, dx) — updated by pure jnp
functions with per-slot masks.  All small-matrix linear algebra (the
dz x dz innovation solve) is unrolled at trace time into elementwise VPU
ops, so predict+update for hundreds of tracks is a handful of fused XLA
kernels with no host round-trips.

Numerics: the reference runs float64 + plain-form covariance update with
a jittered Cholesky fallback (base.py:461-500).  Here we run float32 and
use the Joseph-form update, which keeps covariances PSD by construction;
the Cholesky sqrt is clamped as the equivalent of the jitter repair.

Layout conventions shared by every filter:
  * state = [measurement dims..., velocity dims...]
  * H projects the first dz state dims (update_mat pattern in base.py:52)
  * process/measurement noise are diagonal.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from boxmot_tpu.ops.geometry import wrap_angle


@dataclasses.dataclass(frozen=True)
class KFLayout:
    """Static description of one Kalman parameterization.

    All callables operate on batched arrays (leading K axis) and are
    closed over at trace time — a layout never appears inside the jitted
    graph, only the arrays it produces.
    """

    name: str
    dx: int  # state dimension
    dz: int  # measurement dimension
    motion_mat: tuple  # (dx, dx) nested tuple, static
    init_mean: Callable  # (K, dz) -> (K, dx)
    init_cov_diag: Callable  # (K, dz) meas -> (K, dx) std
    process_diag: Callable  # (K, dx) mean -> (K, dx) std
    meas_diag: Callable  # (K, dx) mean -> (K, dz) std
    enforce: Callable  # (K, dx) mean -> (K, dx)
    nsa: bool = False  # scale measurement noise by (1 - conf) on update

    @property
    def F(self):
        return jnp.asarray(self.motion_mat, jnp.float32)


def _chol_lower(S, eps=1e-9):
    """Unrolled Cholesky of batched (..., D, D) PSD matrices.

    Returns the lower factor as a DxD list-of-lists of (...,) arrays.
    The sqrt clamp plays the role of the reference's jittered Cholesky
    repair (base.py:461-500) — a non-PD matrix degrades gracefully
    instead of raising.
    """
    D = S.shape[-1]
    L = [[None] * D for _ in range(D)]
    for i in range(D):
        for j in range(i + 1):
            s = S[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    return L


def inv_psd_small(S):
    """Batched inverse of small PSD matrices via unrolled Cholesky.

    S: (..., D, D) with small static D (4 or 5 here).  Fully elementwise:
    no lax.linalg, so it fuses into the surrounding kernel on TPU.
    """
    D = S.shape[-1]
    L = _chol_lower(S)
    # M = L^-1 (lower triangular), unrolled forward substitution.
    M = [[None] * D for _ in range(D)]
    for i in range(D):
        M[i][i] = 1.0 / L[i][i]
        for j in range(i):
            s = L[i][j] * M[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * M[k][j]
            M[i][j] = -s / L[i][i]
    # Sinv = M^T M ; Sinv[a,b] = sum_{k >= max(a,b)} M[k][a] * M[k][b]
    rows = []
    for a in range(D):
        cols = []
        for b in range(D):
            s = None
            for k in range(max(a, b), D):
                t = M[k][a] * M[k][b]
                s = t if s is None else s + t
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def align_obb_to_ref(meas, ref, size_weight: float = 0.05):
    """Resolve OBB parameterization ambiguity against a reference state.

    meas, ref: (K, 5) [cx, cy, w, h, theta].  A rotated rect equals
    (w,h,th), (w,h,th+pi), (h,w,th+pi/2), (h,w,th-pi/2); pick the
    candidate minimizing |wrapped angle delta| + size_weight * log-size
    difference (KalmanFilterXYWH._align_obb_measurement,
    motion/kalman_filters/xywh.py:88-133 / base.py:135-160).
    """
    eps = 1e-6
    w = jnp.maximum(meas[..., 2], eps)
    h = jnp.maximum(meas[..., 3], eps)
    th = meas[..., 4]
    ref_w = jnp.maximum(ref[..., 2], eps)
    ref_h = jnp.maximum(ref[..., 3], eps)
    ref_th = ref[..., 4]

    cand_w = jnp.stack([w, w, h, h], axis=-1)  # (K, 4)
    cand_h = jnp.stack([h, h, w, w], axis=-1)
    cand_t = jnp.stack(
        [th, th + jnp.pi, th + jnp.pi / 2, th - jnp.pi / 2], axis=-1
    )
    aligned_t = ref_th[..., None] + wrap_angle(cand_t - ref_th[..., None])
    angle_cost = jnp.abs(aligned_t - ref_th[..., None])
    size_cost = jnp.abs(jnp.log(cand_w / ref_w[..., None])) + jnp.abs(
        jnp.log(cand_h / ref_h[..., None])
    )
    best = jnp.argmin(angle_cost + size_weight * size_cost, axis=-1)
    take = lambda c: jnp.take_along_axis(c, best[..., None], axis=-1)[..., 0]
    return jnp.stack(
        [meas[..., 0], meas[..., 1], take(cand_w), take(cand_h), take(aligned_t)],
        axis=-1,
    )


def align_obb_xysr(z, ref, size_weight: float = 0.05):
    """Resolve OBB parameterization ambiguity in XYSR measurement space.

    z, ref: (K, 5) [cx, cy, s, r, theta].  A rotated rect equals
    (s, r, th), (s, r, th+pi), (s, 1/r, th+pi/2), (s, 1/r, th-pi/2);
    pick the candidate minimizing |wrapped angle delta| +
    size_weight * |log(r / ref_r)| (KalmanFilterXYSR._align_obb_measurement,
    motion/kalman_filters/xysr.py:96-136 / base.py:130-160).
    """
    eps = 1e-6
    r = jnp.maximum(z[..., 3], eps)
    th = wrap_angle(z[..., 4])
    ref_r = jnp.maximum(ref[..., 3], eps)
    ref_th = ref[..., 4]

    cand_r = jnp.stack([r, r, 1.0 / r, 1.0 / r], axis=-1)  # (K, 4)
    cand_t = jnp.stack(
        [th, th + jnp.pi, th + jnp.pi / 2, th - jnp.pi / 2], axis=-1
    )
    aligned_t = ref_th[..., None] + wrap_angle(cand_t - ref_th[..., None])
    angle_cost = jnp.abs(aligned_t - ref_th[..., None])
    size_cost = jnp.abs(jnp.log(cand_r / ref_r[..., None]))
    best = jnp.argmin(angle_cost + size_weight * size_cost, axis=-1)
    take = lambda c: jnp.take_along_axis(c, best[..., None], axis=-1)[..., 0]
    return jnp.stack(
        [
            z[..., 0],
            z[..., 1],
            jnp.maximum(z[..., 2], eps),
            jnp.maximum(take(cand_r), eps),
            take(aligned_t),
        ],
        axis=-1,
    )


def initiate(layout: KFLayout, meas):
    """Create (mean, cov) for new tracks from measurements (K, dz).

    Mirrors BaseKalmanFilter.initiate (base.py:234-245): mean = [z, 0],
    cov = diag(init std^2).
    """
    mean = layout.enforce(layout.init_mean(meas))
    std = layout.init_cov_diag(meas)
    cov = jnp.zeros(std.shape + (layout.dx,), std.dtype)
    idx = jnp.arange(layout.dx)
    cov = cov.at[..., idx, idx].set(jnp.square(std))
    return mean, cov


def predict(layout: KFLayout, mean, cov, mask):
    """Masked batched predict (base.py:252-268 / multi_predict:311-327).

    mean: (K, dx), cov: (K, dx, dx), mask: (K,) — slots where mask is
    False pass through unchanged.
    """
    F = layout.F
    std = layout.process_diag(mean)
    new_mean = mean @ F.T
    FP = jnp.einsum("ab,kbc->kac", F, cov)
    new_cov = jnp.einsum("kac,bc->kab", FP, F)
    idx = jnp.arange(layout.dx)
    new_cov = new_cov.at[..., idx, idx].add(jnp.square(std))
    new_mean = layout.enforce(new_mean)
    m = mask[:, None]
    return (
        jnp.where(m, new_mean, mean),
        jnp.where(m[..., None], new_cov, cov),
    )


def update(layout: KFLayout, mean, cov, meas, conf, mask, gain_scale=None):
    """Masked batched correction step (base.py:329-358), Joseph form.

    meas: (K, dz) per-slot measurement; conf: (K,) detection confidence
    for NSA scaling (GIAOTracker formula in base.py:294-303 — active only
    when layout.nsa); mask: (K,) slots to update; gain_scale: optional
    (K,) factor applied to the MEAN update only (OccluTrack abnormal
    motion suppression, motion/kalman_filters/xyhr.py:340-371 — the
    covariance still contracts normally).
    """
    dz, dx = layout.dz, layout.dx
    r_std = layout.meas_diag(mean)
    if layout.nsa:
        r_std = r_std * (1.0 - conf)[:, None]
    r_var = jnp.square(r_std)

    S = cov[:, :dz, :dz] + jnp.zeros_like(cov[:, :dz, :dz]).at[
        :, jnp.arange(dz), jnp.arange(dz)
    ].set(r_var)
    Sinv = inv_psd_small(S)
    gain = jnp.einsum("kad,kdz->kaz", cov[:, :, :dz], Sinv)  # (K, dx, dz)

    innov = meas - mean[:, :dz]
    delta = jnp.einsum("kz,kaz->ka", innov, gain)
    if gain_scale is not None:
        delta = delta * gain_scale[:, None]
    new_mean = mean + delta

    # Joseph form: P = (I - K H) P (I - K H)^T + K R K^T with H = [I 0].
    A = jnp.zeros_like(cov).at[:, jnp.arange(dx), jnp.arange(dx)].set(1.0)
    A = A.at[:, :, :dz].add(-gain)
    AP = jnp.einsum("kab,kbc->kac", A, cov)
    new_cov = jnp.einsum("kac,kbc->kab", AP, A)
    new_cov = new_cov + jnp.einsum("kaz,kz,kbz->kab", gain, r_var, gain)

    new_mean = layout.enforce(new_mean)
    m = mask[:, None]
    return (
        jnp.where(m, new_mean, mean),
        jnp.where(m[..., None], new_cov, cov),
    )


def gating_distance(layout: KFLayout, mean, cov, meas, only_position: bool = False):
    """Squared Mahalanobis distance of measurements to projected states.

    mean: (K, dx), cov: (K, dx, dx), meas: (N, dz) -> (K, N).
    Mirrors BaseKalmanFilter.gating_distance (base.py:523-551, maha).
    """
    dz = 2 if only_position else layout.dz
    r_var = jnp.square(layout.meas_diag(mean))[:, :dz]
    S = cov[:, :dz, :dz] + jnp.zeros_like(cov[:, :dz, :dz]).at[
        :, jnp.arange(dz), jnp.arange(dz)
    ].set(r_var)
    Sinv = inv_psd_small(S)
    d = meas[None, :, :dz] - mean[:, None, :dz]  # (K, N, dz)
    return jnp.einsum("knz,kzy,kny->kn", d, Sinv, d)


# ---------------------------------------------------------------------------
# Layout factories (std weights and structure per reference subclass files)
# ---------------------------------------------------------------------------

_SWP = 1.0 / 20  # _std_weight_position (base.py:60-65)
_SWV = 1.0 / 160  # _std_weight_velocity


def _cv_motion_mat(dz):
    """Constant-velocity [[I, I], [0, I]] transition (base.py:96-103)."""
    import numpy as np

    F = np.eye(2 * dz)
    for i in range(dz):
        F[i, dz + i] = 1.0
    return tuple(map(tuple, F))


def make_xyah_layout(
    obb: bool = False,
    std_weight_position: float = _SWP,
    std_weight_velocity: float = _SWV,
    nsa: bool = False,
) -> KFLayout:
    """[cx, cy, a=w/h, h] (+theta) constant-velocity filter — ByteTrack /
    StrongSort lineage (motion/kalman_filters/xyah.py:8-160)."""
    dz = 5 if obb else 4
    swp, swv = std_weight_position, std_weight_velocity

    def init_mean(z):
        z = z.at[..., 4].set(wrap_angle(z[..., 4])) if obb else z
        return jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)

    def init_cov_diag(z):
        h = z[..., 3]
        pos = [2 * swp * h, 2 * swp * h, jnp.full_like(h, 1e-2), 2 * swp * h]
        vel = [10 * swv * h, 10 * swv * h, jnp.full_like(h, 1e-5), 10 * swv * h]
        if obb:
            pos.append(jnp.full_like(h, 1e-2))
            vel.append(jnp.full_like(h, 1e-5))
        return jnp.stack(pos + vel, axis=-1)

    def process_diag(mean):
        h = mean[..., 3]
        pos = [swp * h, swp * h, jnp.full_like(h, 1e-2), swp * h]
        vel = [swv * h, swv * h, jnp.full_like(h, 1e-5), swv * h]
        if obb:
            pos.append(jnp.full_like(h, 1e-2))
            vel.append(jnp.full_like(h, 1e-5))
        return jnp.stack(pos + vel, axis=-1)

    def meas_diag(mean):
        h = mean[..., 3]
        std = [swp * h, swp * h, jnp.full_like(h, 1e-1), swp * h]
        if obb:
            std.append(jnp.full_like(h, 1e-1))
        return jnp.stack(std, axis=-1)

    def enforce(mean):
        mean = mean.at[..., 2].set(jnp.maximum(mean[..., 2], 1e-4))
        mean = mean.at[..., 3].set(jnp.maximum(mean[..., 3], 1e-4))
        if obb:
            mean = mean.at[..., 4].set(wrap_angle(mean[..., 4]))
        return mean

    return KFLayout(
        name="xyah_obb" if obb else "xyah",
        dx=2 * dz,
        dz=dz,
        motion_mat=_cv_motion_mat(dz),
        init_mean=init_mean,
        init_cov_diag=init_cov_diag,
        process_diag=process_diag,
        meas_diag=meas_diag,
        enforce=enforce,
        nsa=nsa,
    )


def make_xywh_layout(
    obb: bool = False,
    std_weight_position: float = _SWP,
    std_weight_velocity: float = _SWV,
    nsa: bool = False,
) -> KFLayout:
    """[cx, cy, w, h] (+theta) constant-velocity filter — BotSort and
    ByteTrack-OBB (motion/kalman_filters/xywh.py:8-200)."""
    dz = 5 if obb else 4
    swp, swv = std_weight_position, std_weight_velocity

    def init_mean(z):
        z = z.at[..., 4].set(wrap_angle(z[..., 4])) if obb else z
        return jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)

    def _wh_stack(mean_or_z, kp, kv, theta_p, theta_v):
        w, h = mean_or_z[..., 2], mean_or_z[..., 3]
        pos = [kp * w, kp * h, kp * w, kp * h]
        vel = [kv * w, kv * h, kv * w, kv * h]
        if obb:
            pos.append(jnp.full_like(w, theta_p))
            vel.append(jnp.full_like(w, theta_v))
        return jnp.stack(pos + vel, axis=-1)

    def init_cov_diag(z):
        return _wh_stack(z, 2 * swp, 10 * swv, 1e-2, 1e-5)

    def process_diag(mean):
        return _wh_stack(mean, swp, swv, 1e-2, 1e-5)

    def meas_diag(mean):
        w, h = mean[..., 2], mean[..., 3]
        std = [swp * w, swp * h, swp * w, swp * h]
        if obb:
            std.append(jnp.full_like(w, 1e-1))
        return jnp.stack(std, axis=-1)

    def enforce(mean):
        mean = mean.at[..., 2].set(jnp.maximum(mean[..., 2], 1e-4))
        mean = mean.at[..., 3].set(jnp.maximum(mean[..., 3], 1e-4))
        if obb:
            mean = mean.at[..., 4].set(wrap_angle(mean[..., 4]))
        return mean

    return KFLayout(
        name="xywh_obb" if obb else "xywh",
        dx=2 * dz,
        dz=dz,
        motion_mat=_cv_motion_mat(dz),
        init_mean=init_mean,
        init_cov_diag=init_cov_diag,
        process_diag=process_diag,
        meas_diag=meas_diag,
        enforce=enforce,
        nsa=nsa,
    )


def make_xyscr_layout() -> KFLayout:
    """[x, y, s=area, c=confidence, r=aspect] score-aware HybridSort filter
    (motion/kalman_filters/xyscr.py:10-60 + the Q/R/P0 scaling applied by
    hybridsort.py:127-133): 9-D state with velocities for x, y, s, c."""
    import numpy as np

    dz, dx = 5, 9
    F = np.eye(dx)
    F[0, 5] = F[1, 6] = F[2, 7] = F[3, 8] = 1.0  # x, y, s, c have velocities
    p0 = np.array([10.0] * 5 + [10000.0] * 4)
    q = np.ones(dx)
    q[5:7] *= 0.01
    q[7] *= 1e-4  # Q[5:,5:] *= .01 then Q[-2,-2] *= .01
    q[8] *= 1e-4
    r = np.array([1.0, 1.0, 10.0, 10.0, 10.0])
    p0_std = tuple(np.sqrt(p0))
    q_std = tuple(np.sqrt(q))
    r_std = tuple(np.sqrt(r))

    def init_mean(z):
        return jnp.concatenate(
            [z, jnp.zeros(z.shape[:-1] + (dx - dz,), z.dtype)], axis=-1
        )

    def init_cov_diag(z):
        return jnp.broadcast_to(jnp.asarray(p0_std, z.dtype), z.shape[:-1] + (dx,))

    def process_diag(mean):
        return jnp.broadcast_to(jnp.asarray(q_std, mean.dtype), mean.shape[:-1] + (dx,))

    def meas_diag(mean):
        return jnp.broadcast_to(jnp.asarray(r_std, mean.dtype), mean.shape[:-1] + (dz,))

    def enforce(mean):
        mean = mean.at[..., 2].set(jnp.maximum(mean[..., 2], 1e-6))
        mean = mean.at[..., 4].set(jnp.maximum(mean[..., 4], 1e-6))
        return mean

    return KFLayout(
        name="xyscr",
        dx=dx,
        dz=dz,
        motion_mat=tuple(map(tuple, F)),
        init_mean=init_mean,
        init_cov_diag=init_cov_diag,
        process_diag=process_diag,
        meas_diag=meas_diag,
        enforce=enforce,
    )


def make_xyhr_layout(obb: bool = False) -> KFLayout:
    """[x, y, h, r=w/h] (+theta) constant-velocity filter with BoostTrack's
    constant noise policy (motion/kalman_filters/xyhr.py:10-110):
    P0 = 10*I with 1000x velocity block, Q = diag(1, .01 velocities),
    R = diag([1, 1, 10, 0.01])."""
    import numpy as np

    dz = 5 if obb else 4
    dx = 2 * dz
    p0 = np.array([10.0] * dz + [10000.0] * dz)
    q = np.array([1.0] * dz + [0.01] * dz)
    if obb:
        q[4] = 0.01  # theta process noise (xyhr.py:93-95)
        r = np.array([1.0, 1.0, 10.0, 0.01, 0.01])
    else:
        r = np.array([1.0, 1.0, 10.0, 0.01])
    p0_std = tuple(np.sqrt(p0))
    q_std = tuple(np.sqrt(q))
    r_std = tuple(np.sqrt(r))

    def init_mean(z):
        if obb:
            z = z.at[..., 4].set(wrap_angle(z[..., 4]))
        return jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)

    def init_cov_diag(z):
        return jnp.broadcast_to(jnp.asarray(p0_std, z.dtype), z.shape[:-1] + (dx,))

    def process_diag(mean):
        return jnp.broadcast_to(jnp.asarray(q_std, mean.dtype), mean.shape[:-1] + (dx,))

    def meas_diag(mean):
        return jnp.broadcast_to(jnp.asarray(r_std, mean.dtype), mean.shape[:-1] + (dz,))

    def enforce(mean):
        mean = mean.at[..., 2].set(jnp.maximum(mean[..., 2], 1e-4))
        mean = mean.at[..., 3].set(jnp.maximum(mean[..., 3], 1e-4))
        if obb:
            mean = mean.at[..., 4].set(wrap_angle(mean[..., 4]))
        return mean

    return KFLayout(
        name="xyhr_obb" if obb else "xyhr",
        dx=dx,
        dz=dz,
        motion_mat=_cv_motion_mat(dz),
        init_mean=init_mean,
        init_cov_diag=init_cov_diag,
        process_diag=process_diag,
        meas_diag=meas_diag,
        enforce=enforce,
    )


def make_xysr_layout(
    obb: bool = False,
    q_xy_scaling: float = 0.01,
    q_s_scaling: float = 0.0001,
    q_a_scaling: float = 0.0001,
) -> KFLayout:
    """[cx, cy, s=area, r=aspect] (+theta) SORT-style filter with constant
    Q/R/P0 exactly as OC-SORT configures KalmanFilterXYSR
    (trackers/bbox/ocsort/ocsort.py:90-190): r is static (no velocity).
    """
    import numpy as np

    dz = 5 if obb else 4
    dx = 9 if obb else 7

    F = np.eye(dx)
    if obb:
        F[0, 5] = F[1, 6] = F[2, 7] = F[4, 8] = 1.0
        p0 = np.array([10.0] * 5 + [10000.0] * 4)
        q = np.ones(dx)
        q[5:7] *= q_xy_scaling
        q[7] *= q_s_scaling
        q[8] *= q_a_scaling
        r = np.array([1.0, 1.0, 10.0, 10.0, 10.0])
    else:
        F[0, 4] = F[1, 5] = F[2, 6] = 1.0
        p0 = np.array([10.0] * 4 + [10000.0] * 3)
        q = np.ones(dx)
        q[4:6] *= q_xy_scaling
        q[6] *= q_s_scaling
        r = np.array([1.0, 1.0, 10.0, 10.0])

    p0_std = tuple(np.sqrt(p0))
    q_std = tuple(np.sqrt(q))
    r_std = tuple(np.sqrt(r))

    def init_mean(z):
        return jnp.concatenate(
            [z, jnp.zeros(z.shape[:-1] + (dx - dz,), z.dtype)], axis=-1
        )

    def init_cov_diag(z):
        return jnp.broadcast_to(
            jnp.asarray(p0_std, z.dtype), z.shape[:-1] + (dx,)
        )

    def process_diag(mean):
        return jnp.broadcast_to(
            jnp.asarray(q_std, mean.dtype), mean.shape[:-1] + (dx,)
        )

    def meas_diag(mean):
        return jnp.broadcast_to(
            jnp.asarray(r_std, mean.dtype), mean.shape[:-1] + (dz,)
        )

    def enforce(mean):
        # xysr.py:160 _enforce_state_constraints: s, r clamped positive.
        mean = mean.at[..., 2].set(jnp.maximum(mean[..., 2], 1e-6))
        mean = mean.at[..., 3].set(jnp.maximum(mean[..., 3], 1e-6))
        if obb:
            mean = mean.at[..., 4].set(wrap_angle(mean[..., 4]))
        return mean

    return KFLayout(
        name="xysr_obb" if obb else "xysr",
        dx=dx,
        dz=dz,
        motion_mat=tuple(map(tuple, F)),
        init_mean=init_mean,
        init_cov_diag=init_cov_diag,
        process_diag=process_diag,
        meas_diag=meas_diag,
        enforce=enforce,
    )
