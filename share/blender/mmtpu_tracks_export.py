"""Blender-side exporter for the uvtrack format.

Runs INSIDE Blender (the `bpy` module is provided by the host
application); the counterpart of the reference's
share/blender/mmSolver_blender_addon 2D-track exporter, written from
scratch against the published bpy motion-tracking API.  Install as an
add-on or run from the text editor; exports the active movie clip's
selected tracks as uvtrack v4 JSON, readable by
mayamatchmovesolver_tpu (io/uvtrack.py) and mmSolver's Load Markers.

Blender's marker coordinates are already normalized [0, 1] with v up —
the uvtrack convention; marker.co is the pattern center.
"""

import json

import bpy  # provided by Blender

bl_info = {
    "name": "mmtpu: Export 2D Tracks (uvtrack)",
    "author": "mayamatchmovesolver_tpu",
    "version": (1, 0, 0),
    "blender": (2, 80, 0),
    "category": "Import-Export",
    "description": "Export motion-tracking 2D tracks to uvtrack v4",
}


def _active_clip(context):
    space = context.space_data
    clip = getattr(space, "clip", None)
    if clip is None and bpy.data.movieclips:
        clip = bpy.data.movieclips[0]
    return clip


def export_tracks(clip, file_path, selected_only=True):
    tracking = clip.tracking
    points = []
    for track in tracking.tracks:
        if selected_only and not track.select:
            continue
        per_frame = []
        for marker in track.markers:
            if marker.mute:
                continue
            per_frame.append(
                {
                    "frame": int(marker.frame),
                    "pos": [float(marker.co[0]), float(marker.co[1])],
                    "pos_dist": [float(marker.co[0]),
                                 float(marker.co[1])],
                    "weight": float(track.weight),
                }
            )
        entry = {
            "name": track.name,
            "id": None,
            "set_name": clip.name,
            "per_frame": per_frame,
        }
        if track.has_bundle:
            b = track.bundle
            entry["3d"] = {
                "x": float(b[0]), "y": float(b[1]), "z": float(b[2]),
                "x_lock": True, "y_lock": True, "z_lock": True,
            }
        points.append(entry)

    cam = tracking.camera
    data = {
        "version": 4,
        "num_points": len(points),
        "is_undistorted": None,
        "points": points,
        "camera": {
            "sensor_mm": [float(cam.sensor_width),
                          float(cam.sensor_width)
                          * clip.size[1] / max(clip.size[0], 1)],
            "per_frame": [
                {"frame": int(f), "focal_length_mm":
                 float(cam.focal_length)}
                for f in range(clip.frame_start,
                               clip.frame_start + clip.frame_duration)
            ],
        },
    }
    with open(file_path, "w") as f:
        json.dump(data, f, indent=1)
    return len(points)


class MMTPU_OT_export_uvtrack(bpy.types.Operator):
    """Export selected 2D tracks to a uvtrack v4 file"""

    bl_idname = "mmtpu.export_uvtrack"
    bl_label = "Export 2D Tracks (uvtrack)"

    filepath: bpy.props.StringProperty(subtype="FILE_PATH")

    def execute(self, context):
        clip = _active_clip(context)
        if clip is None:
            self.report({"ERROR"}, "no movie clip")
            return {"CANCELLED"}
        n = export_tracks(clip, bpy.path.abspath(self.filepath))
        self.report({"INFO"}, "wrote %d track(s)" % n)
        return {"FINISHED"}

    def invoke(self, context, event):
        context.window_manager.fileselect_add(self)
        return {"RUNNING_MODAL"}


def register():
    bpy.utils.register_class(MMTPU_OT_export_uvtrack)


def unregister():
    bpy.utils.unregister_class(MMTPU_OT_export_uvtrack)


if __name__ == "__main__":
    register()
