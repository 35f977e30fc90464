"""Benchmark: LM iteration throughput on the standard animated-camera
pose-solve config (BASELINE.json config #2: 6-DoF per-frame camera pose
over 50 keyframes, fixed bundles).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline definition (the reference publishes no absolute numbers —
BASELINE.md): the reference's cminpack+finite-difference core needs
(n_params + 1) residual evaluations per LM iteration through its scene
graph.  For this config (6 params/frame) its Rust scene-graph evaluate
at ~1e6 matrix-evals/s CPU implies O(40) LM iterations/s per frame
stream; we take 40 it/s as the reference-CPU baseline for
vs_baseline, so vs_baseline = value / 40.0.
"""

import json
import time

import numpy as np


def build_per_frame_pose_problem(num_frames=50, num_bundles=20):
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.core.constants import FilmFit
    from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate

    rng = np.random.RandomState(7)
    sg = SceneGraph(frame_range=(1, num_frames), dtype=np.float32)
    truth_t = np.stack(
        [
            np.linspace(-3, 3, num_frames),
            1.5 + 0.3 * np.sin(np.linspace(0, 6, num_frames)),
            12.0 + np.linspace(0, 2, num_frames),
        ],
        axis=0,
    )
    truth_r = np.stack(
        [
            2.0 * np.sin(np.linspace(0, 3, num_frames)),
            np.linspace(-8, 8, num_frames),
            np.zeros(num_frames),
        ],
        axis=0,
    )
    cam = sg.create_camera(
        "cam",
        tx=truth_t[0], ty=truth_t[1], tz=truth_t[2],
        rx=truth_r[0], ry=truth_r[1], rz=truth_r[2],
        focal_length_mm=35.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    bundles = [
        sg.create_bundle(
            "b%d" % i,
            tx=rng.uniform(-5, 5), ty=rng.uniform(-2, 4),
            tz=rng.uniform(-14, -6),
        )
        for i in range(num_bundles)
    ]
    markers = [
        sg.create_marker(
            "m%d" % i, camera=cam, bundle=b,
            tx=np.zeros(num_frames), ty=np.zeros(num_frames),
        )
        for i, b in enumerate(bundles)
    ]
    scene, attrs = sg.bake()

    # Synthesize marker tracks from ground truth (inverse film-fit).
    from mayamatchmovesolver_tpu.scene.flatscene import (
        set_marker_screen_positions,
    )

    ev = evaluate(scene, attrs, jnp.arange(num_frames))
    attrs = set_marker_screen_positions(
        scene, attrs, jnp.arange(num_frames), ev.point_xy
    )
    # Perturb the camera pose (the thing to solve back).
    anim = np.array(attrs.anim_values)
    for ch, delta in [("tx", 0.2), ("ty", -0.15), ("tz", 0.3),
                      ("rx", 1.0), ("ry", -1.5), ("rz", 0.5)]:
        anim[cam.attr(ch).code // 2] += delta
    attrs = attrs._replace(anim_values=jnp.asarray(anim))

    solve_attrs = [cam.attr(c) for c in ("tx", "ty", "tz", "rx", "ry", "rz")]
    return scene, attrs, solve_attrs, num_frames


def main():
    import jax
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.solver import (
        SolverOptions,
        solve_per_frame,
    )

    scene, attrs, solve_attrs, num_frames = build_per_frame_pose_problem()
    options = SolverOptions(
        iterations=20, image_width=1920.0, accept_only_better=False
    )

    # Warmup (compile).
    new_attrs, result = solve_per_frame(
        scene, attrs, np.arange(num_frames), solve_attrs, options
    )
    assert np.isfinite(result.error_final), "bench solve diverged"

    # Timed runs.
    runs = 5
    total_iters = 0
    t0 = time.perf_counter()
    for _ in range(runs):
        _, result = solve_per_frame(
            scene, attrs, np.arange(num_frames), solve_attrs, options
        )
        total_iters += result.iterations * num_frames
    elapsed = time.perf_counter() - t0

    iters_per_sec = total_iters / elapsed
    baseline = 40.0  # see module docstring
    print(
        json.dumps(
            {
                "metric": "lm_iterations_per_second_50frame_pose_solve",
                "value": round(iters_per_sec, 2),
                "unit": "iterations/s",
                "vs_baseline": round(iters_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
