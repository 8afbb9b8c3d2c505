"""Interactive GUI path exercised against a stub dearpygui module.

dearpygui is not installed in this image, so the window branch
(cli/gui.py setup_window/step/close_window — reference gui.py:92-183) is
driven by a minimal fake that records calls and simulates mouse events.
"""
import sys
import types

import numpy as np
import pytest

from relightable3dgaussian_tpu.cli.gui import GUI, OrbitCamera


class FakeDPG(types.ModuleType):
    mvFormat_Float_rgb = 0
    mvMouseButton_Left = 0
    mvMouseButton_Middle = 2

    def __init__(self):
        super().__init__("dearpygui.dearpygui")
        self.values = {}
        self.items = {}
        self.calls = []
        self.handlers = {"drag": [], "wheel": []}
        self.frames = 0
        self.running_frames = 3

    def __getattr__(self, name):  # default no-op recorder
        def f(*a, **k):
            self.calls.append((name, a, k))
            return _Ctx()
        return f

    # explicit pieces the GUI relies on
    def create_context(self):
        self.calls.append(("create_context",))

    def destroy_context(self):
        self.calls.append(("destroy_context",))

    def texture_registry(self):
        return _Ctx()

    def window(self, **k):
        return _Ctx()

    def group(self, **k):
        return _Ctx()

    def handler_registry(self):
        return _Ctx()

    def add_raw_texture(self, w, h, data, format=None, tag=None):
        self.values[tag] = np.asarray(data)

    def add_combo(self, items, default_value=None, tag=None, width=None,
                  callback=None):
        self.items[tag] = list(items)
        self.values[tag] = default_value
        self._mode_cb = callback

    def add_text(self, text="", tag=None):
        if tag:
            self.values[tag] = text

    def add_mouse_drag_handler(self, button=None, callback=None):
        self.handlers["drag"].append((button, callback))

    def add_mouse_wheel_handler(self, callback=None):
        self.handlers["wheel"].append(callback)

    def set_value(self, tag, value):
        self.values[tag] = value

    def configure_item(self, tag, items=None, **k):
        if items is not None:
            self.items[tag] = list(items)

    def is_dearpygui_running(self):
        return self.frames < self.running_frames

    def render_dearpygui_frame(self):
        self.frames += 1

    def is_mouse_button_down(self, b):
        return False


class _Ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture
def fake_dpg(monkeypatch):
    fake = FakeDPG()
    pkg = types.ModuleType("dearpygui")
    pkg.dearpygui = fake
    monkeypatch.setitem(sys.modules, "dearpygui", pkg)
    monkeypatch.setitem(sys.modules, "dearpygui.dearpygui", fake)
    return fake


def _render_fn(camera):
    h, w = camera.height, camera.width
    return {"render": np.full((3, h, w), 0.25, np.float32),
            "depth": np.ones((1, h, w), np.float32),
            "normal": np.zeros((3, h, w), np.float32),
            "radii": np.zeros((7,), np.int32)}  # non-image: excluded


def test_window_loop_renders_and_builds_mode_menu(fake_dpg):
    gui = GUI(32, 24, _render_fn, mode="render")
    gui.run_window()
    assert fake_dpg.frames == 3
    # texture got a full frame each step
    tex = np.asarray(fake_dpg.values["_tex"])
    assert tex.shape == (24 * 32 * 3,)
    assert np.allclose(tex, 0.25)
    # mode menu auto-built from image-shaped results only
    assert fake_dpg.items["_mode"] == ["depth", "normal", "render"]
    assert "FPS" in fake_dpg.values["_fps"]
    ("destroy_context",) in fake_dpg.calls


def test_mouse_handlers_drive_orbit(fake_dpg):
    gui = GUI(32, 32, _render_fn)
    gui.setup_window()
    az0, el0 = gui.orbit.azimuth, gui.orbit.elevation
    r0 = gui.orbit.radius
    drags = {b: cb for b, cb in fake_dpg.handlers["drag"]}
    drags[FakeDPG.mvMouseButton_Left](None, (0, 30.0, -12.0))
    assert gui.orbit.azimuth != az0 and gui.orbit.elevation != el0
    fake_dpg.handlers["wheel"][0](None, 2.0)
    assert gui.orbit.radius < r0
    c0 = gui.orbit.center.copy()
    drags[FakeDPG.mvMouseButton_Middle](None, (0, 5.0, 3.0))
    assert not np.allclose(gui.orbit.center, c0)
    gui.close_window()


def test_mode_switch_changes_display(fake_dpg):
    gui = GUI(16, 16, _render_fn, mode="render")
    gui.setup_window()
    gui.step()
    fake_dpg._mode_cb(None, "depth")
    gui.step()
    tex = np.asarray(fake_dpg.values["_tex"])
    assert np.allclose(tex, 1.0)  # depth plane repeated to rgb
    gui.close_window()


def test_orbit_camera_geometry():
    orbit = OrbitCamera(64, 48, radius=3.0)
    orbit.orbit(0.7, 0.3)
    cam = orbit.camera()
    # camera sits at `radius` from the center and looks at it
    c2w = cam.c2w
    eye = np.asarray(c2w[:3, 3])
    assert np.isclose(np.linalg.norm(eye - orbit.center), 3.0, atol=1e-5)
