"""Nuke lens file parsing tests (format per lens_io.rs:433-856)."""

import numpy as np

from mayamatchmovesolver_tpu.io import lensfile

SAMPLE = """
LD_3DE_Classic_LD_Model {
 direction undistort
 tde4_focal_length_cm 3.5
 tde4_filmback_width_cm 3.6
 tde4_filmback_height_cm 2.4
 tde4_lens_center_offset_x_cm 0
 tde4_lens_center_offset_y_cm 0
 tde4_pixel_aspect 1
 Distortion {{curve x1 0.1 x2 0.15 x3 0.2 }}
 Anamorphic_Squeeze 1.1
 Curvature_X 0.05
 Curvature_Y -0.02
 Quartic_Distortion 0.01
 name lens1
}
LD_3DE4_Radial_Standard_Degree_4 {
 Distortion_Degree_2 0.08
 U_Degree_2 0.01
 Phi_Cylindric_Direction 15.0
 B_Cylindric_Bending 0.05
 name lens2
}
"""


def test_parse_two_layers():
    layers = lensfile.parse_string(SAMPLE)
    assert len(layers.layers) == 2
    l0, l1 = layers.layers
    assert l0.model_type == "tde_classic"
    assert l1.model_type == "tde_radial_std_deg4"
    assert l0.frame_range == (1, 3)

    assert l0.value_at("distortion", 2) == 0.15
    assert l0.value_at("distortion", 99) == 0.2  # clamped hold
    assert l0.value_at("anamorphic_squeeze", 1) == 1.1
    assert l1.value_at("cylindric_direction", 1) == 15.0
    assert layers.camera["tde4_focal_length_cm"] == 3.5


def test_layer_model_construction():
    layers = lensfile.parse_string(SAMPLE)
    model = layers.layers[0].model_at(1)
    np.testing.assert_allclose(float(model.distortion), 0.1, rtol=1e-12)
    np.testing.assert_allclose(float(model.anamorphic_squeeze), 1.1,
                               rtol=1e-12)


def test_multi_layer_distort_round_trip():
    layers = lensfile.parse_string(SAMPLE)
    pts = np.array([[0.2, 0.1], [-0.3, 0.25], [0.0, 0.0]])
    d = np.asarray(layers.distort(1, pts))
    u = np.asarray(layers.undistort(1, d))
    np.testing.assert_allclose(u, pts, atol=1e-8)


def test_write_round_trip(tmp_path):
    import os

    layers = lensfile.parse_string(SAMPLE)
    path = os.path.join(tmp_path, "lens.nk")
    lensfile.write(path, layers)
    back = lensfile.parse(path)
    assert len(back.layers) == 2
    assert back.layers[0].value_at("distortion", 2) == 0.15
    assert back.camera["tde4_filmback_width_cm"] == 3.6
