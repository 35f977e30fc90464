"""Object-oriented user API.

Counterpart of the reference's Python API
(ref: python/mmSolver/api.py re-exporting python/mmSolver/_api):
Camera/Bundle/Marker/Attribute wrappers come from the scene graph; this
module adds the Collection + Solver + execute() workflow
(ref: _api/collection.py:218, _api/_execute/main.py:215) on top of the
TPU solve engine.

Typical use:

    import mayamatchmovesolver_tpu.api as mmapi

    sg = mmapi.SceneGraph(frame_range=(1, 100))
    cam = sg.create_camera('cam', ...)
    bnd = sg.create_bundle('bnd', ...)
    mkr = sg.create_marker('mkr', camera=cam, bundle=bnd, ...)

    col = mmapi.Collection(sg)
    col.add_marker(mkr)
    col.add_attribute(bnd.attr('tx'))
    col.set_solver(mmapi.SolverStandard(frame_indices=range(100)))
    results = mmapi.execute(col)
"""

import dataclasses
from typing import List, Optional

from mayamatchmovesolver_tpu.scene.scenegraph import (  # noqa: F401
    Attribute,
    BundleNode as Bundle,
    CameraNode as Camera,
    MarkerNode as Marker,
    SceneGraph,
    TransformNode as Transform,
)
from mayamatchmovesolver_tpu.models import scenelens  # noqa: F401
from mayamatchmovesolver_tpu.solver.solve import SolverOptions
from mayamatchmovesolver_tpu.solver.strategies import (  # noqa: F401
    SolverBasic,
    SolverStandard,
    SolverStep,
)
from mayamatchmovesolver_tpu.solver import results as results_mod


@dataclasses.dataclass
class Collection:
    """A solve set: markers to measure, attributes to adjust, a solver
    schedule (ref: _api/collection.py:218 — stored as a Maya set there;
    plain Python here)."""

    scene_graph: SceneGraph
    markers: List[Marker] = dataclasses.field(default_factory=list)
    attributes: List[Attribute] = dataclasses.field(default_factory=list)
    solver: Optional[object] = None
    options: SolverOptions = dataclasses.field(
        default_factory=SolverOptions
    )

    def add_marker(self, *markers):
        for m in markers:
            if m not in self.markers:
                self.markers.append(m)
        return self

    def add_attribute(self, *attrs):
        for a in attrs:
            if a not in self.attributes:
                self.attributes.append(a)
        return self

    def set_solver(self, solver):
        self.solver = solver
        return self

    def get_marker_list(self):
        return list(self.markers)

    def get_attribute_list(self):
        return list(self.attributes)


def validate(collection: Collection):
    """Problem validation before execution
    (ref: _execute/main.py:51 validate action twins +
    adjust_base.cpp:864-882 sizing checks).  Returns (ok, messages)."""
    messages = []
    if not collection.markers:
        messages.append("collection has no markers")
    if not collection.attributes:
        messages.append("collection has no attributes")
    if collection.solver is None:
        messages.append("collection has no solver")
    # errors >= parameters on at least the full frame set.
    if collection.markers and collection.attributes:
        frames = getattr(collection.solver, "frame_indices", [0])
        n_frames = max(len(list(frames)), 1)
        num_errors = len(collection.markers) * n_frames * 2
        num_params = 0
        for a in collection.attributes:
            num_params += n_frames if a.code % 2 == 1 else 1
        if num_errors < num_params:
            messages.append(
                "not enough marker errors (%d) for parameters (%d)"
                % (num_errors, num_params)
            )
    return (not messages), messages


def execute(collection: Collection, options: Optional[SolverOptions] = None,
            lens=None):
    """Compile + run the collection's solver schedule.

    (ref: _api/_execute/main.py:215-544 — minus the Maya viewport/
    evaluation-manager management that has no meaning here.)
    Returns (new_attrs, [SolverResult]).  The scene graph's baked attrs
    are used as the starting state.
    """
    ok, messages = validate(collection)
    if not ok:
        result = results_mod.SolverResult()
        result.success = False
        result.reason_string = "; ".join(messages)
        return None, [result]

    options = options or collection.options
    scene, attrs = collection.scene_graph.bake()
    if lens is None:
        baked_lens = scenelens.bake_scene_lens(collection.scene_graph)
        lens = baked_lens if baked_lens.has_any() else None

    # Only the collection's markers measure error (the reference
    # restricts the solve to the Collection set's members,
    # _api/collection.py; markers outside the set are ignored).
    import numpy as np

    marker_mask = None
    all_markers = collection.scene_graph._markers
    if len(collection.markers) != len(all_markers):
        marker_mask = np.zeros(len(all_markers), dtype=bool)
        for m in collection.markers:
            marker_mask[m.mkr_index] = True

    solver = collection.solver
    return solver.execute(
        scene, attrs, collection.attributes, options,
        lens=lens, marker_mask=marker_mask,
    )


def combine_results(result_lists) -> dict:
    """Merge SolveResults like the reference's solveresult helpers
    (ref: _api/solveresult.py combine_timer_stats/merge_frame_error_list).
    """
    merged = {
        "success": all(r.success for r in result_lists),
        "error_final": (
            result_lists[-1].error_final if result_lists else None
        ),
        "total_iterations": sum(r.iterations for r in result_lists),
        "total_function_evals": sum(
            r.function_evals for r in result_lists
        ),
        "total_solve_seconds": sum(
            r.timer.solve_seconds for r in result_lists
        ),
        "per_frame_error": {},
    }
    for r in result_lists:
        merged["per_frame_error"].update(r.per_frame_error.as_dict())
    return merged
