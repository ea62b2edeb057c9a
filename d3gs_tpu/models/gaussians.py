"""Explicit 3D-Gaussian point-cloud state, TPU-native.

Functional re-design of the reference `GaussianModel`
(scene/gaussian_model.py, 401 LoC). The reference grows/shrinks torch
parameter tensors and performs Adam-state surgery on densification
(cat/prune/replace, :242-315). Under XLA that would mean a recompile per
densify step, so the design here is:

  * **fixed-capacity padded buffers**: every per-Gaussian array has leading
    dim `capacity`; an `alive` mask marks real rows. Shapes never change ⇒
    one compiled train step for the whole run, and the N axis shards over a
    device mesh trivially.
  * **densify/clone/split/prune = masked writes**: free slots are assigned
    to clone/split children with a cumsum ranking; sources of splits are
    overwritten in place by their first child. Exactly reproduces the
    reference's selection rules (:338-401) including the 0.8·N scale shrink
    and the N(0, scale) child sampling.
  * **integrated Adam**: a hand-rolled Adam (torch semantics: bias
    correction, eps added outside the sqrt, eps=1e-15) whose moment buffers
    live alongside the params, so "optimizer-state surgery" is just the same
    masked write applied to m/v — zero moments for new children, preserved
    moments elsewhere (reference :242-315 semantics).

Parameters (pre-activation, exactly the reference's internal storage):
  xyz (C,3) · features_dc (C,1,3) · features_rest (C,K-1,3) ·
  scaling (C,3, log) · rotation (C,4, unnormalized wxyz) ·
  opacity (C,1, logit)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.knn import knn_mean_sq_dist
from ..ops.sh import rgb2sh
from ..ops.schedules import expon_lr
from ..ops.transforms import cov3d_packed, inverse_sigmoid, quat_to_rotmat


class GaussianParams(NamedTuple):
    """The trainable leaves (a pytree; same split as the reference's six
    optimizer param groups, scene/gaussian_model.py:126-133)."""
    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array


class AdamState(NamedTuple):
    m: GaussianParams
    v: GaussianParams
    count: jax.Array  # () int32 step counter (shared; torch keeps per-group)


@struct.dataclass
class GaussianState:
    params: GaussianParams
    alive: jax.Array               # (C,) bool
    # densification statistics (reference :398-401)
    grad_accum: jax.Array          # (C,) accumulated ‖∂L/∂mean2d‖
    denom: jax.Array               # (C,)
    max_radii2d: jax.Array         # (C,) float32
    opt: AdamState
    active_sh_degree: jax.Array    # () int32
    max_sh_degree: int = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    # ------------------------------ activations ---------------------------
    @property
    def get_xyz(self) -> jax.Array:
        return self.params.xyz

    @property
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self) -> jax.Array:
        q = self.params.rotation
        return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)

    @property
    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.params.opacity)

    @property
    def get_features(self) -> jax.Array:
        return jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        return cov3d_packed(self.get_scaling, self.params.rotation,
                            scaling_modifier)

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _round_capacity(n: int) -> int:
    """Pad to a lane-friendly multiple so the N axis tiles onto the VPU."""
    return max(1024, int(np.ceil(n / 1024)) * 1024)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Re-pad every per-Gaussian buffer to a larger capacity.

    The TPU answer to the reference's dynamically growing tensors
    (gaussian_model.py cat_tensors_to_optimizer): shapes stay static
    between growths, and a growth costs one recompile of the train step —
    trainers trigger it when densification fills ~90% of the buffer, a
    handful of times per run. New rows are dead (alive=False), quaternions
    identity, Adam moments zero."""
    cap = state.capacity
    assert new_capacity >= cap
    pad = new_capacity - cap
    if pad == 0:
        return state

    def grow(x, fill=0.0):
        if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != cap:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)

    params = state.params._replace(
        **{k: grow(v) for k, v in state.params._asdict().items()})
    rot = params.rotation.at[cap:, 0].set(1.0)
    params = params._replace(rotation=rot)
    opt = state.opt._replace(
        **{k: (jax.tree.map(grow, v) if k != "count" else v)
           for k, v in state.opt._asdict().items()})
    return state.replace(
        params=params, opt=opt,
        alive=grow(state.alive, False),
        grad_accum=grow(state.grad_accum),
        denom=grow(state.denom),
        max_radii2d=grow(state.max_radii2d),
        capacity=new_capacity)


def create_from_pcd(points: np.ndarray, colors: np.ndarray, *,
                    sh_degree: int = 3, spatial_lr_scale: float = 1.0,
                    max_gaussians: int = 500_000,
                    capacity: int = 0, seed: int = 0) -> GaussianState:
    """Initialize from a point cloud (reference create_from_pcd :87-118):
    subsample to max_gaussians, DC color from RGB, scales from 3-NN mean
    squared distance, identity rotations, opacity 0.1."""
    n_total = points.shape[0]
    if n_total > max_gaussians:
        rng = np.random.default_rng(seed)
        sel = rng.choice(n_total, max_gaussians, replace=False)
        points, colors = points[sel], colors[sel]
    n = points.shape[0]
    cap = capacity or _round_capacity(n)
    assert cap >= n
    k = (sh_degree + 1) ** 2

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = points
    f_dc = np.zeros((cap, 1, 3), np.float32)
    f_dc[:n, 0] = np.asarray(rgb2sh(colors.astype(np.float32)))
    f_rest = np.zeros((cap, k - 1, 3), np.float32)

    if n > 150_000:
        # large clouds: native grid-accelerated kNN on the host
        from ..native import knn_mean_sq_dist_native
        dist2 = np.maximum(knn_mean_sq_dist_native(points), 1e-7)
    else:
        dist2 = np.maximum(
            np.asarray(knn_mean_sq_dist(jnp.asarray(points, jnp.float32))),
            1e-7)
    scaling = np.zeros((cap, 3), np.float32)
    scaling[:n] = np.log(np.sqrt(dist2))[:, None]

    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((cap, 1), float(inverse_sigmoid(jnp.float32(0.1))),
                      np.float32)

    params = GaussianParams(
        xyz=jnp.asarray(xyz), features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest), scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation), opacity=jnp.asarray(opacity))
    # m and v must be distinct buffers (donation would otherwise see the
    # same buffer twice)
    zeros_m = jax.tree.map(jnp.zeros_like, params)
    zeros_v = jax.tree.map(jnp.zeros_like, params)
    alive = jnp.arange(cap) < n
    return GaussianState(
        params=params, alive=alive,
        grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
        opt=AdamState(m=zeros_m, v=zeros_v, count=jnp.zeros((), jnp.int32)),
        active_sh_degree=jnp.zeros((), jnp.int32),
        max_sh_degree=sh_degree, capacity=cap,
        spatial_lr_scale=float(spatial_lr_scale))


def oneup_sh_degree(state: GaussianState) -> GaussianState:
    return state.replace(active_sh_degree=jnp.minimum(
        state.active_sh_degree + 1, state.max_sh_degree))


# ---------------------------------------------------------------------------
# optimizer: torch-semantics Adam with per-group learning rates
# ---------------------------------------------------------------------------

def group_learning_rates(opt_cfg, step, spatial_lr_scale: float) -> GaussianParams:
    """Per-group LRs at `step` (reference training_setup :120-152 +
    update_learning_rate :141-146: xyz follows the expon schedule scaled by
    the camera extent; f_rest = feature_lr / 20)."""
    xyz_lr = expon_lr(
        step,
        lr_init=opt_cfg.position_lr_init * spatial_lr_scale,
        lr_final=opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps)
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.asarray(opt_cfg.feature_lr, jnp.float32),
        features_rest=jnp.asarray(opt_cfg.feature_lr / 20.0, jnp.float32),
        scaling=jnp.asarray(opt_cfg.scaling_lr, jnp.float32),
        rotation=jnp.asarray(opt_cfg.rotation_lr, jnp.float32),
        opacity=jnp.asarray(opt_cfg.opacity_lr, jnp.float32),
    )


def adam_step(params: GaussianParams, grads: GaussianParams, opt: AdamState,
              lrs: GaussianParams, *, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-15,
              mask: jax.Array | None = None) -> tuple[GaussianParams, AdamState]:
    """One Adam update (torch flavor: eps outside sqrt, bias correction).
    `mask` (C,) freezes padding rows so dead slots never drift."""
    count = opt.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    def upd(p, g, m, v, lr):
        if mask is not None:
            bmask = mask.reshape((-1,) + (1,) * (g.ndim - 1)).astype(g.dtype)
            g = g * bmask
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / c1
        vh = v / c2
        return p - lr * mh / (jnp.sqrt(vh) + eps), m, v

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(params, grads, opt.m, opt.v, lrs):
        np_, nm, nv = upd(p, g, m, v, lr)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)
    return (GaussianParams(*new_p), AdamState(GaussianParams(*new_m),
                                              GaussianParams(*new_v), count))


# ---------------------------------------------------------------------------
# densification statistics + densify / prune / opacity reset
# ---------------------------------------------------------------------------

def add_densification_stats(state: GaussianState, screenspace_grad: jax.Array,
                            radii: jax.Array) -> GaussianState:
    """Accumulate ‖∂L/∂mean2d‖ for visible Gaussians and track max radius
    (reference :398-401 + train.py:283-290)."""
    visible = radii > 0
    norm = jnp.linalg.norm(screenspace_grad[:, :2], axis=-1)
    return state.replace(
        grad_accum=state.grad_accum + jnp.where(visible, norm, 0.0),
        denom=state.denom + visible.astype(state.denom.dtype),
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(visible, radii.astype(jnp.float32),
                                          0.0)),
    )


def _masked_rank(mask: jax.Array) -> jax.Array:
    """Exclusive cumsum rank of True entries."""
    c = jnp.cumsum(mask.astype(jnp.int32))
    return c - mask.astype(jnp.int32)


def _free_slot_for_rank(free: jax.Array, capacity: int) -> jax.Array:
    """(C,) bool free mask -> (C,) array mapping rank r -> slot index
    (slots beyond the number of free slots map to `capacity`, a drop
    sentinel)."""
    idx = jnp.nonzero(free, size=capacity, fill_value=capacity)[0]
    return idx


def _scatter_params(params: GaussianParams, slots: jax.Array,
                    new_vals: GaussianParams, valid: jax.Array) -> GaussianParams:
    """Write new_vals rows into `slots` where valid (drop out-of-range)."""
    tgt = jnp.where(valid, slots, params.xyz.shape[0])

    def wr(p, nv):
        return p.at[tgt].set(nv, mode="drop")

    return jax.tree.map(wr, params, new_vals)


def densify_and_prune(
    state: GaussianState, key: jax.Array, *,
    max_grad: float, min_opacity: float, extent: float,
    max_screen_size: float, percent_dense: float,
) -> GaussianState:
    """One densification pass (reference densify_and_prune :382-396 with
    densify_and_clone :365-380 and densify_and_split :338-363), re-expressed
    as masked writes on the padded buffers. Fully jittable; shapes static."""
    cap = state.capacity
    p = state.params
    alive = state.alive

    grads = jnp.where(state.denom > 0, state.grad_accum / state.denom, 0.0)
    scaling = jnp.exp(p.scaling)
    max_scale = jnp.max(scaling, axis=-1)
    over_grad = (grads >= max_grad) & alive

    clone_sel = over_grad & (max_scale <= percent_dense * extent)
    split_sel = over_grad & (max_scale > percent_dense * extent)

    # ---- prune (reference :383-390): low opacity, oversized screen/world
    opacity = jax.nn.sigmoid(p.opacity[:, 0])
    prune_sel = opacity < min_opacity
    if max_screen_size > 0:
        prune_sel = prune_sel | (state.max_radii2d > max_screen_size) \
            | (max_scale > 0.1 * extent)
    prune_sel = prune_sel & alive
    # split sources are also removed (:361-363)
    remove = prune_sel | split_sel
    alive_after_remove = alive & ~remove

    # ---- allocate free slots: dead rows (incl. removed) are reusable,
    # except split-source rows which are overwritten in place by child A.
    free = ~alive_after_remove & ~split_sel
    free_slots = _free_slot_for_rank(free, cap)

    # ---- split children (2 per source; reference :338-359)
    n_samp = 2
    std = scaling  # stds = get_scaling of the source
    key, k1 = jax.random.split(key)
    samples = jax.random.normal(k1, (n_samp, cap, 3)) * std[None]
    rot = quat_to_rotmat(p.rotation)  # (C, 3, 3)
    offsets = jnp.einsum("nij,snj->sni", rot, samples)  # (2, C, 3)
    child_xyz = p.xyz[None] + offsets
    child_scaling = jnp.log(scaling / (0.8 * n_samp))

    def child_params(i):
        return GaussianParams(
            xyz=child_xyz[i],
            features_dc=p.features_dc,
            features_rest=p.features_rest,
            scaling=child_scaling,
            rotation=p.rotation,
            opacity=p.opacity,
        )

    # child A overwrites the source slot in place
    ca = child_params(0)
    own = split_sel.reshape(-1, 1)

    def inplace(dst, src):
        m = own.reshape((-1,) + (1,) * (dst.ndim - 1))
        return jnp.where(m, src, dst)

    new_p = jax.tree.map(inplace, p, ca)
    alive_new = alive_after_remove | split_sel

    # child B goes to a free slot by rank
    rank_b = _masked_rank(split_sel)
    slot_b = free_slots[jnp.minimum(rank_b, cap - 1)]
    valid_b = split_sel & (rank_b < jnp.sum(free.astype(jnp.int32)))
    cb = child_params(1)
    new_p = _scatter_params(new_p, slot_b, cb, valid_b)

    # ---- clones (copy verbatim; reference :365-380)
    n_free = jnp.sum(free.astype(jnp.int32))
    rank_c = _masked_rank(clone_sel) + jnp.sum(valid_b.astype(jnp.int32))
    slot_c = free_slots[jnp.minimum(rank_c, cap - 1)]
    valid_c = clone_sel & (rank_c < n_free)
    new_p = _scatter_params(new_p, slot_c, p, valid_c)

    # mark B/C slots alive
    def mark(mask_arr, slots, valid):
        return mask_arr.at[jnp.where(valid, slots, cap)].set(True, mode="drop")

    alive_new = mark(alive_new, slot_b, valid_b)
    alive_new = mark(alive_new, slot_c, valid_c)

    # ---- Adam-state surgery: moments zeroed for every touched slot
    # (split-source in-place rows, child-B rows, clone rows); preserved
    # elsewhere (reference :242-315).
    def zero_rows(t):
        m = own.reshape((-1,) + (1,) * (t.ndim - 1))
        t = jnp.where(m, 0.0, t)
        t = t.at[jnp.where(valid_b, slot_b, cap)].set(0.0, mode="drop")
        t = t.at[jnp.where(valid_c, slot_c, cap)].set(0.0, mode="drop")
        return t

    new_m = GaussianParams(*jax.tree.map(zero_rows, state.opt.m))
    new_v = GaussianParams(*jax.tree.map(zero_rows, state.opt.v))

    return state.replace(
        params=new_p, alive=alive_new,
        grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        # reference densification_postfix zeroes max_radii2D every pass
        max_radii2d=jnp.zeros(cap),
        opt=AdamState(new_m, new_v, state.opt.count),
    )


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to ≤0.01 and zero its Adam moments (reference
    reset_opacity :187-190 + replace_tensor_to_optimizer :242-255)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(state.params.opacity),
                                         0.01))
    return state.replace(
        params=state.params._replace(opacity=new_op),
        opt=AdamState(
            m=state.opt.m._replace(opacity=jnp.zeros_like(new_op)),
            v=state.opt.v._replace(opacity=jnp.zeros_like(new_op)),
            count=state.opt.count),
    )
