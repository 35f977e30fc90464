"""Solver strategies: Step / Basic / Standard / Camera schedules.

Counterparts of the reference's Python solver classes
(ref: python/mmSolver/_api/solverstep.py, solverbasic.py:44,
solverstandard.py:40-76,633-746): a strategy compiles into a list of
Action steps (here: closures running solve()/solve_per_frame()) executed
in order — the root-then-animated coarse-to-fine schedule that makes
long-sequence solves tractable (ref: docs/source/solver_design.rst:
188-218 on the O(n^2) static-attr blow-up the schedule avoids).
"""

import dataclasses
from typing import Optional, Sequence

import numpy as np

from mayamatchmovesolver_tpu.solver import rootframe as rootframe_mod
from mayamatchmovesolver_tpu.solver.solve import (
    SolverOptions,
    solve,
    solve_per_frame,
)


def _expand_mask(marker_mask, scene, frame_indices):
    """(M,) marker selection -> (M, F) marker_frame_mask (None passes
    through: all markers measured)."""
    if marker_mask is None:
        return None
    return np.broadcast_to(
        np.asarray(marker_mask, dtype=bool)[:, None],
        (scene.num_markers, len(list(frame_indices))),
    )


@dataclasses.dataclass
class Action:
    """One executable solve step
    (ref: python/mmSolver/_api/action.py Action(func,args,kwargs))."""

    name: str
    func: object
    args: tuple = ()
    kwargs: dict = dataclasses.field(default_factory=dict)

    def run(self):
        return self.func(*self.args, **self.kwargs)


class SolverBase:
    """(ref: solverbase.py.)  Subclasses implement execute(); compile()
    exposes the schedule as Actions for inspection."""

    def execute(self, scene, attrs, solve_attrs, options=None,
                lens=None, marker_mask=None):
        raise NotImplementedError

    def compile(self, scene, attrs, solve_attrs, options=None,
                lens=None, marker_mask=None):
        return [
            Action(
                name=type(self).__name__,
                func=self.execute,
                args=(scene, attrs, solve_attrs, options),
                kwargs=dict(lens=lens, marker_mask=marker_mask),
            )
        ]


class SolverStep(SolverBase):
    """Raw single step over an explicit frame list
    (ref: solverstep.py)."""

    def __init__(self, frame_indices):
        self.frame_indices = list(frame_indices)

    def execute(self, scene, attrs, solve_attrs, options=None,
                lens=None, marker_mask=None):
        options = options or SolverOptions()
        attrs, result = solve(
            scene, attrs, self.frame_indices, solve_attrs, options,
            lens=lens, marker_frame_mask=_expand_mask(
                marker_mask, scene, self.frame_indices
            ),
        )
        return attrs, [result]


class SolverBasic(SolverBase):
    """Animated-attribute per-frame sweep
    (ref: solverbasic.py:44 — anim attrs only, one solve per frame;
    ours batches all frames through one vmapped LM)."""

    def __init__(self, frame_indices):
        self.frame_indices = list(frame_indices)

    def execute(self, scene, attrs, solve_attrs, options=None,
                lens=None, marker_mask=None):
        options = options or SolverOptions()
        anim = [a for a in solve_attrs if a.code % 2 == 1]
        attrs, result = solve_per_frame(
            scene, attrs, self.frame_indices, anim, options,
            lens=lens, marker_mask=marker_mask,
        )
        return attrs, [result]


class RootFrameStrategy:
    """Root-frame iteration strategies
    (ref: constant.py:355-366 SOLVER_STD_STRATEGY_* — GLOBAL,
    FWD_PAIR, FWD_PAIR_AND_GLOBAL, FWD_INCREMENT — orchestrated by
    compile_multi_frame, solverstandard.py:721-745)."""

    GLOBAL = "global"
    FWD_PAIR = "fwd_pair"
    FWD_PAIR_AND_GLOBAL = "fwd_pair_and_global"
    FWD_INCREMENT = "fwd_increment"


def root_frame_schedule(root_frames, strategy):
    """Expand root frames into a list of frame-batches to solve in
    order, per the chosen strategy."""
    roots = sorted(root_frames)
    if strategy == RootFrameStrategy.GLOBAL:
        return [list(roots)]
    if strategy == RootFrameStrategy.FWD_PAIR:
        return [[a, b] for a, b in zip(roots, roots[1:])] or [roots]
    if strategy == RootFrameStrategy.FWD_PAIR_AND_GLOBAL:
        out = [[a, b] for a, b in zip(roots, roots[1:])] or [roots]
        out.append(list(roots))
        return out
    if strategy == RootFrameStrategy.FWD_INCREMENT:
        return [roots[: i + 2] for i in range(len(roots) - 1)] or [roots]
    raise ValueError("unknown root frame strategy: %r" % strategy)


class SolverStandard(SolverBase):
    """Root-frames pass (static + anim at roots) then per-frame anim
    pass, then optional global pass
    (ref: solverstandard.py:40-76; compile_multi_frame at
    solverstandardutils.py orchestrated from solverstandard.py:633-746).
    """

    def __init__(
        self,
        frame_indices: Sequence[int],
        root_frame_indices: Optional[Sequence[int]] = None,
        use_single_frame: bool = False,
        global_solve: bool = False,
        root_frame_span: int = 10,
        root_frame_strategy: str = RootFrameStrategy.GLOBAL,
    ):
        self.frame_indices = list(frame_indices)
        self.root_frame_indices = (
            list(root_frame_indices) if root_frame_indices is not None
            else None
        )
        self.use_single_frame = use_single_frame
        self.global_solve = global_solve
        self.root_frame_span = root_frame_span
        self.root_frame_strategy = root_frame_strategy

    def _auto_root_frames(self, scene, attrs):
        from mayamatchmovesolver_tpu.scene import evaluate
        import jax.numpy as jnp

        ev = evaluate(scene, attrs, jnp.asarray(self.frame_indices))
        roots = rootframe_mod.get_root_frames_from_markers(
            np.asarray(ev.marker_enable), self.frame_indices
        )
        roots = rootframe_mod.root_frames_subdivide(
            roots, self.root_frame_span
        )
        return [f for f in roots if f in self.frame_indices]

    def execute(self, scene, attrs, solve_attrs, options=None,
                lens=None, marker_mask=None):
        options = options or SolverOptions()
        results = []

        if self.use_single_frame or len(self.frame_indices) == 1:
            attrs, result = solve(
                scene, attrs, self.frame_indices[:1], solve_attrs, options,
                lens=lens, marker_frame_mask=_expand_mask(
                    marker_mask, scene, self.frame_indices[:1]
                ),
            )
            return attrs, [result]

        static_attrs = [a for a in solve_attrs if a.code % 2 == 0]
        anim_attrs = [a for a in solve_attrs if a.code % 2 == 1]

        roots = self.root_frame_indices
        if roots is None:
            roots = self._auto_root_frames(scene, attrs)
        if not roots:
            roots = [self.frame_indices[0], self.frame_indices[-1]]

        # Pass 1: root frames, all attributes (static couple all
        # roots), batched per the root-frame strategy.
        for batch in root_frame_schedule(roots,
                                         self.root_frame_strategy):
            attrs, result = solve(
                scene, attrs, batch, solve_attrs, options, lens=lens,
                marker_frame_mask=_expand_mask(marker_mask, scene, batch),
            )
            results.append(result)

        # Pass 2: per-frame animated sweep over the full range.
        if anim_attrs:
            attrs, result = solve_per_frame(
                scene, attrs, self.frame_indices, anim_attrs, options,
                lens=lens, marker_mask=marker_mask,
            )
            results.append(result)

        # Pass 3 (optional): one global all-frames polish.
        if self.global_solve:
            attrs, result = solve(
                scene, attrs, self.frame_indices, solve_attrs, options,
                lens=lens, marker_frame_mask=_expand_mask(
                    marker_mask, scene, self.frame_indices
                ),
            )
            results.append(result)

        del static_attrs
        return attrs, results
