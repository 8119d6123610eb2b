"""TreePM short-range gravity orchestration (grav_short_tree analog).

Ties together: Morton sort -> octree build -> grouped traversal ->
dense evaluation -> unsort, with the reference's parameterization
(TreeRcut, Asmth, BHOpeningAngle / relative opening, Plummer-equivalent
softening 2.8x; gravshort-tree.c:32-155).

The whole pipeline is one jittable pure function
(:func:`tree_force`) with **no host round-trips**: capacities are
static, and "buffer full" conditions (the reference's export-buffer
retry, treewalk.c:801-902) surface as overflow flags in the returned
:class:`TreeForceResult` that callers check asynchronously (e.g. once
per output time, not per step).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .tree import TreeConfig
from .tree32 import build_tree32, sort_by_morton32_payload
from .treewalk import (WalkConfig, make_block_groups, make_leaf_sources,
                       traverse_fused, evaluate_leaves)


@struct.dataclass
class TreeForceResult:
    accel: jnp.ndarray          # f32[N,3] internal units, original order
    potential: jnp.ndarray      # f32[N] internal units (0 if not computed)
    overflow: jnp.ndarray       # bool: any capacity exceeded (redo bigger)
    # active-target compaction diagnostics (hierarchical stepping):
    # true number of active blocks, and whether active_block_cap was
    # exceeded (retry with a bigger cap WITHOUT touching walk buffers)
    n_active_blocks: jnp.ndarray
    compact_overflow: jnp.ndarray


@partial(jax.jit, static_argnames=(
    "leaf_max", "max_level", "node_cap", "group_size",
    "walk_cfg", "with_potential", "use_bh", "rcut_box", "theta2",
    "err_tol_force_acc", "rs_inv_box", "h_inv_box", "g_over_box2",
    "active_block_cap"))
def tree_force(ipos, mass, valid, acc_old_mag, *, leaf_max, max_level,
               node_cap, group_size, walk_cfg, rcut_box,
               theta2, use_bh, err_tol_force_acc, rs_inv_box, h_inv_box,
               g_over_box2, with_potential, target_active=None,
               active_block_cap=None):
    """Short-range tree force for all particles, fully on-device.

    acc_old_mag: |a_old| per particle in internal units (relative
    opening criterion, gravshort-tree.c:221-240); geometry internally
    in box units, result scaled by g_over_box2 = G/box^2 (and G/box
    for the potential).

    target_active: optional bool[N] — only blocks containing an active
    particle are walked (hierarchical-timebin stepping, the active-set
    analog of timestep.c:298); inactive targets get zero accel and the
    caller keeps their old values.  All valid particles remain sources.

    active_block_cap: optional static int — compact the active target
    blocks to this many slots before the walk, so walk + leaf cost
    scales with the ACTIVE set instead of N (the payoff of the
    reference's active-only force trees, forcetree.h:125-140; without
    it inactive lanes still ride every vectorized walk iteration).
    Overflow (more active blocks than the cap) is reported in the
    result for the caller's resize-and-retry.
    """
    n = ipos.shape[0]
    G = group_size
    npad = (-n) % G
    if npad:
        ipos = jnp.pad(ipos, ((0, npad), (0, 0)))
        mass = jnp.pad(mass, (0, npad))
        valid = jnp.pad(valid, (0, npad))
        acc_old_mag = jnp.pad(acc_old_mag, (0, npad))
        if target_active is not None:
            target_active = jnp.pad(target_active, (0, npad))

    # carry all per-particle fields through one multi-operand sort
    # (a post-sort [perm] gather costs ~175 ms/column at 16.7M; a sort
    # payload column ~10 ms)
    payload = [mass, acc_old_mag]
    if target_active is not None:
        payload.append(target_active.astype(jnp.uint8))
    hi, lo, perm, ipos_s, valid_s, pay_s = sort_by_morton32_payload(
        ipos, valid, payload)
    mass_s = pay_s[0]
    amag_s = pay_s[1]

    tree = build_tree32(hi, lo, ipos_s, mass_s, valid_s, leaf_max,
                        max_level, node_cap, group_max=G)
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)

    tpos, gc, gh, amin, active = make_block_groups(
        pos_box, valid_s, amag_s, G)
    if target_active is not None:
        act_s = (valid_s & pay_s[2].astype(bool)).reshape(-1, G)
        active = active & jnp.any(act_s, axis=1)
    aold = err_tol_force_acc * amin / g_over_box2

    nb = tpos.shape[0]
    compact_ovf = jnp.asarray(False)
    n_act = jnp.asarray(0, jnp.int32)
    if target_active is not None:
        n_act = jnp.sum(active.astype(jnp.int32))
    if target_active is not None and active_block_cap is not None \
            and active_block_cap < nb:
        # compact active blocks to [cap] slots: one scatter + gathers,
        # then every vectorized walk iteration touches cap lanes, not
        # nb (the active-only-tree payoff, forcetree.h:125-140)
        cap = active_block_cap
        rank = jnp.cumsum(active.astype(jnp.int32)) - 1
        compact_ovf = n_act > cap
        bidx = jnp.zeros(cap, jnp.int32).at[
            jnp.where(active, jnp.minimum(rank, cap - 1), cap)
        ].set(jnp.arange(nb, dtype=jnp.int32), mode="drop")
        slot_ok = jnp.arange(cap) < n_act
        tpos_c = tpos[bidx]
        acc0, pot0, leaf_idx, nl, walk_ovf = traverse_fused(
            tree, tpos_c, gc[bidx], gh[bidx], aold[bidx], slot_ok,
            walk_cfg, rcut_box, theta2, use_bh, rs_inv_box, h_inv_box,
            with_potential=with_potential)
    else:
        bidx = None
        tpos_c = tpos
        acc0, pot0, leaf_idx, nl, walk_ovf = traverse_fused(
            tree, tpos, gc, gh, aold, active, walk_cfg,
            rcut_box, theta2, use_bh, rs_inv_box, h_inv_box,
            with_potential=with_potential)
    ntot = n + npad
    nleaf_cap = int(walk_cfg.nleaf_frac * ntot) + 256
    sr_cap = int(walk_cfg.sr_frac * ntot) + 256
    leaf_src = make_leaf_sources(tree, pos_box, mass_s, valid_s,
                                 nleaf_cap, sr_cap, walk_cfg.sub)
    acc_box, pot_box, src_ovf = evaluate_leaves(
        tree, leaf_src, tpos_c, leaf_idx, nl,
        acc0, pot0, walk_cfg, rs_inv_box, h_inv_box,
        rcut_box, with_potential=with_potential)

    if bidx is not None:
        # scatter compacted block results back to the full sorted array
        cap = active_block_cap
        rows = (jnp.where(slot_ok, bidx, nb)[:, None] * G
                + jnp.arange(G, dtype=jnp.int32)[None, :]).reshape(-1)
        acc_box = jnp.zeros((ntot, 3), jnp.float32).at[rows].set(
            acc_box.reshape(cap * G, 3), mode="drop")
        pot_box = jnp.zeros((ntot,), jnp.float32).at[rows].set(
            pot_box.reshape(cap * G), mode="drop")

    # unsort by scattering through perm (direct inverse, no argsort)
    acc = jnp.zeros((n + npad, 3), jnp.float32).at[perm].set(
        acc_box * jnp.float32(g_over_box2))[:n]
    acc = jnp.where(valid[:n, None], acc, 0.0)
    pot = jnp.zeros((n + npad,), jnp.float32).at[perm].set(pot_box)[:n]
    overflow = (tree.overflow | leaf_src[3] | jnp.any(walk_ovf)
                | jnp.any(src_ovf))
    return TreeForceResult(accel=acc, potential=pot, overflow=overflow,
                           n_active_blocks=n_act,
                           compact_overflow=compact_ovf)


@dataclass
class TreeGravity:
    """Stateful convenience wrapper around :func:`tree_force` holding
    the reference parameterization; see gravshort-tree.c:97-140."""
    boxsize: float
    nmesh: int
    asmth: float = 1.5
    rcut: float = 6.0            # TreeRcut, units of asmth*cellsize
    G: float = 43007.1
    softening: float = 0.0       # FORCE_SOFTENING (=2.8*eps), internal
    err_tol_force_acc: float = 0.002
    bh_opening_angle: float = 0.175
    max_bh_opening_angle: float = 0.9
    tree_use_bh: int = 2         # 2: BH on first call only
    tree_cfg: TreeConfig = field(default_factory=TreeConfig)
    walk_cfg: WalkConfig = field(default_factory=WalkConfig)
    with_potential: bool = True

    def __post_init__(self):
        self._use_bh_now = self.tree_use_bh > 0
        if self.walk_cfg.leaf_eval_max < self.tree_cfg.leaf_max:
            from dataclasses import replace as dc_replace
            self.walk_cfg = dc_replace(
                self.walk_cfg, leaf_eval_max=self.tree_cfg.leaf_max)
        self.last_overflow = None

    # geometry in box units
    @property
    def rcut_box(self):
        return self.rcut * self.asmth / self.nmesh

    @property
    def rs_inv_box(self):
        return self.nmesh / (2.0 * self.asmth)

    @property
    def h_inv_box(self):
        return self.boxsize / max(self.softening, 1e-30)

    def force_kwargs(self, n, use_bh=None):
        """Static+scalar kwargs for tree_force at capacity n."""
        if use_bh is None:
            use_bh = self._use_bh_now
        max_level = min(self.tree_cfg.max_level, 16)
        return dict(
            leaf_max=self.tree_cfg.leaf_max, max_level=max_level,
            node_cap=int(self.tree_cfg.node_factor * n) + 64,
            group_size=self.tree_cfg.group_max,
            walk_cfg=self.walk_cfg,
            rcut_box=float(np.float32(self.rcut_box)),
            theta2=float(np.float32(
                self.bh_opening_angle ** 2 if use_bh
                else self.max_bh_opening_angle ** 2)),
            use_bh=bool(use_bh),
            err_tol_force_acc=float(np.float32(self.err_tol_force_acc)),
            rs_inv_box=float(np.float32(self.rs_inv_box)),
            h_inv_box=float(np.float32(self.h_inv_box)),
            g_over_box2=float(np.float32(self.G / self.boxsize ** 2)),
            with_potential=self.with_potential,
        )

    def compute(self, pdata, return_potential=False,
                target_active=None, active_block_cap=None):
        """Short-range accel (internal units) for all particles (or
        the active subset; inactive rows return zero).

        active_block_cap: static cap on compacted active target blocks
        (see tree_force); callers bucket it to powers of two so the
        jit cache stays small."""
        acc_old = pdata.grav_accel + pdata.grav_pm
        amag = jnp.sqrt(jnp.sum(acc_old * acc_old, axis=-1))
        kw = self.force_kwargs(int(pdata.capacity))
        kw["with_potential"] = self.with_potential or return_potential
        res = tree_force(pdata.ipos, pdata.mass, pdata.valid, amag,
                         target_active=target_active,
                         active_block_cap=active_block_cap, **kw)
        if self.tree_use_bh > 1:
            self._use_bh_now = False  # BH on first call only
        self.last_overflow = res.overflow
        self.last_compact_overflow = res.compact_overflow
        self.last_n_active_blocks = res.n_active_blocks
        if return_potential:
            pot = res.potential * jnp.float32(self.G / self.boxsize)
            return res.accel, pot
        return res.accel
