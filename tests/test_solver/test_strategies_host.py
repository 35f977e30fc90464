"""Strategy scheduling tests (host-side, no solve execution)."""

from mayamatchmovesolver_tpu.solver.strategies import (
    RootFrameStrategy,
    root_frame_schedule,
)


def test_root_frame_schedules():
    roots = [1, 5, 9]
    assert root_frame_schedule(roots, RootFrameStrategy.GLOBAL) == [
        [1, 5, 9]
    ]
    assert root_frame_schedule(roots, RootFrameStrategy.FWD_PAIR) == [
        [1, 5],
        [5, 9],
    ]
    assert root_frame_schedule(
        roots, RootFrameStrategy.FWD_PAIR_AND_GLOBAL
    ) == [[1, 5], [5, 9], [1, 5, 9]]
    assert root_frame_schedule(
        roots, RootFrameStrategy.FWD_INCREMENT
    ) == [[1, 5], [1, 5, 9]]


def test_single_root():
    assert root_frame_schedule([3], RootFrameStrategy.FWD_PAIR) == [[3]]
