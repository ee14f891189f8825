"""FlyCameraController state-machine tests (fly_camera_controller.cpp)."""

import math

import numpy as np

from rayfinder_tpu.render.fly_camera import FlyCameraController, FlyInput


def test_defaults_match_reference():
    c = FlyCameraController()
    np.testing.assert_allclose(c.position, [1.22, 1.25, -1.25], rtol=1e-6)
    assert math.isclose(math.degrees(c.yaw), 129.64, rel_tol=1e-6)
    assert math.isclose(math.degrees(c.pitch), -13.73, rel_tol=1e-6)
    assert c.vfov_degrees == 80.0 and c.focus_distance == 10.0


def test_orientation_orthonormal():
    c = FlyCameraController()
    f, r, u = c.orientation()
    for v in (f, r, u):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)
    assert abs(np.dot(f, r)) < 1e-6
    assert abs(np.dot(np.cross(r, f), u) + 1.0) > 0.0  # right-handed-ish


def test_wasd_translation():
    c = FlyCameraController()
    c.yaw, c.pitch = 0.0, 0.0  # forward = +x
    start = c.position.copy()
    c.update(FlyInput(forward=True), dt=2.0)  # speed 1.0 * 2s forward
    np.testing.assert_allclose(c.position - start, [2.0, 0.0, 0.0], atol=1e-5)
    c.update(FlyInput(up=True, right=True), dt=1.0)
    moved = c.position - start
    assert moved[1] > 0.9  # E went up


def test_look_at_sets_yaw_pitch():
    c = FlyCameraController()
    c.position = np.asarray([0.0, 0.0, 0.0], np.float32)
    c.look_at([1.0, 1.0, 0.0])
    assert math.isclose(c.yaw, 0.0, abs_tol=1e-6)
    assert math.isclose(c.pitch, math.pi / 4, rel_tol=1e-5)
    f, _, _ = c.orientation()
    np.testing.assert_allclose(f, [math.sqrt(0.5), math.sqrt(0.5), 0.0], atol=1e-6)


def test_mouse_look_drag_changes_yaw():
    c = FlyCameraController(window_size=(640, 480))
    c.yaw, c.pitch = 0.0, 0.0
    # Prime last-mouse, then drag horizontally with LMB held.
    c.update(FlyInput(mouse_look=True, mouse_x=320, mouse_y=240), dt=0.016)
    yaw0 = c.yaw
    c.update(FlyInput(mouse_look=True, mouse_x=360, mouse_y=240), dt=0.016)
    assert c.yaw != yaw0
    assert abs(c.pitch) < 1e-4  # horizontal drag leaves pitch alone


def test_pitch_clamped():
    c = FlyCameraController(window_size=(640, 480))
    c.yaw, c.pitch = 0.0, 0.0
    c.update(FlyInput(mouse_look=True, mouse_x=320, mouse_y=240), dt=0.016)
    for _ in range(100):
        c.update(FlyInput(mouse_look=True, mouse_x=320, mouse_y=0), dt=0.016)
        c.update(FlyInput(mouse_look=False, mouse_x=320, mouse_y=240), dt=0.016)
        c.update(FlyInput(mouse_look=True, mouse_x=320, mouse_y=240), dt=0.016)
    assert c.pitch <= math.radians(89.0) + 1e-6


def test_reverse_z_projection_properties():
    c = FlyCameraController(window_size=(640, 480))
    m = c.view_reverse_z_projection()
    assert m.shape == (4, 4)
    f, _, _ = c.orientation()
    # A point far ahead maps near reverse-Z depth 0; a near point maps near 1.
    far_pt = np.append(c.position + 900.0 * f, 1.0)
    near_pt = np.append(c.position + 0.3 * f, 1.0)
    zf = (m @ far_pt)[2] / (m @ far_pt)[3]
    zn = (m @ near_pt)[2] / (m @ near_pt)[3]
    assert 0.0 <= zf < 0.01
    assert zn > 0.5


def test_camera_matches_create_camera():
    c = FlyCameraController()
    cam = c.camera()
    f, r, u = c.orientation()
    np.testing.assert_allclose(cam.right, r, atol=1e-6)
    np.testing.assert_allclose(cam.up, u, atol=1e-6)
