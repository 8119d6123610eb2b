"""TreePM short-range gravity orchestration (grav_short_tree analog).

Ties together: Morton sort -> octree build -> grouped traversal ->
dense evaluation -> unsort, with the reference's parameterization
(TreeRcut, Asmth, BHOpeningAngle / relative opening, Plummer-equivalent
softening 2.8x; gravshort-tree.c:32-155).
"""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .tree import build_tree, TreeConfig
from .treewalk import (WalkConfig, make_target_groups, traverse,
                       evaluate, traverse_fused, evaluate_leaves)
from ..ops.morton import morton_key


@dataclass
class TreeGravity:
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

    def compute(self, pdata, return_potential=False):
        """Short-range accel (internal units) for all particles."""
        # keys: invalid particles pushed to the end
        keys = morton_key(pdata.ipos)
        keys = jnp.where(pdata.valid, keys, ~jnp.uint64(0))
        perm = jnp.argsort(keys)
        keys_s = keys[perm]
        ipos_s = pdata.ipos[perm]
        mass_s = pdata.mass[perm]
        valid_s = pdata.valid[perm]

        n = int(pdata.capacity)
        cap = int(self.tree_cfg.node_factor * n) + 64
        tree = build_tree(keys_s, ipos_s, mass_s, valid_s,
                          self.tree_cfg.leaf_max,
                          self.tree_cfg.max_level, cap,
                          group_max=self.tree_cfg.group_max)

        pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)

        # per-particle |a_old| for the relative opening criterion
        acc_old = (pdata.grav_accel + pdata.grav_pm)[perm]
        amag = jnp.sqrt(jnp.sum(acc_old * acc_old, axis=-1))
        group_cap = (8 * n) // self.tree_cfg.group_max + 64
        while True:
            leaf_nodes, gc, gh, amin, nleaves, lg_ovf = \
                make_target_groups(
                    tree, pos_box, jnp.where(valid_s, amag, jnp.inf),
                    min(group_cap, n + 64), self.tree_cfg.group_max)
            if not bool(lg_ovf) or group_cap >= n + 64:
                break
            group_cap *= 2  # a group holds >= 1 particle
        aold = (self.err_tol_force_acc * amin
                * self.boxsize ** 2 / self.G)

        use_bh = self._use_bh_now
        theta2 = (self.bh_opening_angle ** 2 if use_bh
                  else self.max_bh_opening_angle ** 2)
        want_pot = self.with_potential or return_potential
        # restartable walk: double the leaf-list capacity on overflow
        # (the export-buffer-full retry analog, treewalk.c:801-902).
        # Multipole contributions are evaluated inside the walk (fused);
        # only the direct-interaction leaf list is recorded.
        wcfg = self.walk_cfg
        for attempt in range(4):
            acc0, pot0, leaf_idx, nl, ovf = traverse_fused(
                tree, pos_box, leaf_nodes, gc, gh, aold, wcfg,
                self.tree_cfg.group_max,
                jnp.float32(self.rcut_box), jnp.float32(theta2),
                use_bh, jnp.float32(self.rs_inv_box),
                jnp.float32(self.h_inv_box), with_potential=want_pot)
            if not bool(jnp.any(ovf)):
                break
            from dataclasses import replace as dc_replace
            wcfg = dc_replace(
                wcfg, leaf_list_max=wcfg.leaf_list_max * 2,
                group_batch=max(16, wcfg.group_batch // 2))
        self.walk_cfg = wcfg
        acc_box, pot_box = evaluate_leaves(
            tree, pos_box, mass_s, valid_s, leaf_nodes, leaf_idx, nl,
            acc0, pot0, wcfg, self.tree_cfg.group_max,
            jnp.float32(self.rs_inv_box),
            jnp.float32(self.h_inv_box), jnp.float32(self.rcut_box),
            with_potential=want_pot)

        # back to original order; internal units
        inv = jnp.argsort(perm)
        acc = acc_box[inv] * jnp.float32(self.G / self.boxsize ** 2)
        acc = jnp.where(pdata.valid[:, None], acc, 0.0)
        if self.tree_use_bh > 1:
            self._use_bh_now = False  # BH on first call only
        self.last_overflow = ovf
        self.last_tree = tree
        if return_potential:
            pot = pot_box[inv] * jnp.float32(self.G / self.boxsize)
            return acc, pot
        return acc
