"""Windowing trio: event mirror (R9), poll loop (R6), FromWindowHandle (B2).

Reference semantics: rfw/src/window.rs:20-345 (WindowEvent/DeviceEvent
mirror + InputBundle systems), rfw/src/lib.rs:300-401 (poll loop),
crates/rfw-backend/src/lib.rs:26-33 (FromWindowHandle::init)."""

from __future__ import annotations

import json
import urllib.request

import numpy as np

from rfw_tpu.app import Instance, Stage
from rfw_tpu.app.window import (
    BrowserWindow,
    CloseRequested,
    CursorEntered,
    CursorMoved,
    DeviceEvents,
    ElementState,
    HeadlessWindow,
    KeyboardInput,
    KeyState,
    MouseButton,
    MouseInput,
    MouseMotion,
    MouseState,
    MouseWheel,
    ResizeEvents,
    Resized,
    ScaleFactorChanged,
    VirtualKeyCode,
    WindowData,
    WindowEvents,
)
from rfw_tpu.backend.contract import RecordingBackend


def _instance(w=64, h=32):
    backend = RecordingBackend()
    return Instance(backend, w, h), backend


# ---------------------------------------------------------------------------
# R9: the event mirror itself
# ---------------------------------------------------------------------------
def test_virtual_keycode_mirror_is_complete():
    # winit's VirtualKeyCode has 163 variants; spot-check the families
    assert len(VirtualKeyCode) == 163
    for name in ("Key1", "A", "Z", "Escape", "F24", "Numpad9",
                 "NumpadEnter", "LAlt", "RWin", "WebSearch", "Cut"):
        assert hasattr(VirtualKeyCode, name)


def test_headless_close_ends_loop_and_counts_frames():
    inst, backend = _instance()
    win = HeadlessWindow(64, 32, script=[[], [], []])
    frames = inst.run_windowed(win)
    # 3 scripted polls render 3 frames; the auto CloseRequested poll ends
    # the loop BEFORE its redraw (reference: CloseRequested -> Exit)
    assert frames == 3
    assert win.presented == 3
    assert win.closed
    assert win.last_frame.shape == (32, 64, 4)


def test_input_bundle_fills_key_and_mouse_state():
    inst, _ = _instance()
    seen = []

    def probe(world):
        keys: KeyState = world.get(KeyState)
        mouse: MouseState = world.get(MouseState)
        seen.append((
            keys.pressed(VirtualKeyCode.W),
            keys.just_pressed(VirtualKeyCode.W),
            mouse.pressed(MouseButton.LEFT),
        ))

    inst.with_system(probe, Stage.UPDATE)
    win = HeadlessWindow(64, 32, script=[
        [KeyboardInput(ElementState.PRESSED, VirtualKeyCode.W),
         MouseInput(ElementState.PRESSED, MouseButton.LEFT)],
        [],
        [KeyboardInput(ElementState.RELEASED, VirtualKeyCode.W),
         MouseInput(ElementState.RELEASED, MouseButton.LEFT)],
    ])
    inst.run_windowed(win)
    # frame 0: just pressed; frame 1: held; frame 2: released
    assert seen[0] == (True, True, True)
    assert seen[1] == (True, False, True)
    assert seen[2] == (False, False, False)


def test_window_data_tracks_cursor():
    inst, _ = _instance()
    win = HeadlessWindow(64, 32, script=[
        [CursorEntered(), CursorMoved(10.0, 20.0)],
    ])
    inst.run_windowed(win)
    assert inst.world.get(WindowData).mouse_position == (10.0, 20.0)


def test_device_events_routed_to_their_queue():
    inst, _ = _instance()
    got = []

    def probe(world):
        got.extend(world.get(DeviceEvents).iter())

    inst.with_system(probe, Stage.UPDATE)
    win = HeadlessWindow(64, 32, script=[[MouseMotion(3.0, -2.0)]])
    inst.run_windowed(win)
    assert MouseMotion(3.0, -2.0) in got


# ---------------------------------------------------------------------------
# R6: the poll loop's resize + redraw semantics
# ---------------------------------------------------------------------------
def test_resize_event_resizes_backend():
    inst, backend = _instance(64, 32)
    win = HeadlessWindow(64, 32, script=[[Resized(128, 64)], []])
    inst.run_windowed(win)
    assert ("resize", 128, 64) in backend.calls
    assert inst.render_system.width == 128
    assert win.last_frame.shape == (64, 128, 4)


def test_scale_factor_changed_rescales():
    inst, backend = _instance(64, 32)
    win = HeadlessWindow(64, 32, script=[
        [ScaleFactorChanged(2.0, 64, 32)], []])
    inst.run_windowed(win)
    # HighDPI semantics: render resolution = logical size * scale
    assert inst.render_system.width == 128
    assert inst.render_system.height == 64


def test_max_frames_bounds_an_endless_window():
    inst, _ = _instance()
    # no script -> first poll already emits CloseRequested; give it an
    # endless one instead
    win = HeadlessWindow(64, 32, script=[[] for _ in range(100)])
    frames = inst.run_windowed(win, max_frames=5)
    assert frames == 5


def test_events_resources_observe_window_events():
    inst, _ = _instance()
    got = []

    def probe(world):
        got.append(list(world.get(WindowEvents).iter()))

    inst.with_system(probe, Stage.UPDATE)
    ev = MouseWheel(0.0, -120.0, pixel_delta=True)
    win = HeadlessWindow(64, 32, script=[[ev]])
    inst.run_windowed(win)
    assert ev in got[0]
    resizes = list(inst.world.get(ResizeEvents).iter())
    assert resizes == [] or resizes  # resource exists and drains


# ---------------------------------------------------------------------------
# B2: FromWindowHandle
# ---------------------------------------------------------------------------
def test_from_window_handle_recording():
    win = HeadlessWindow(320, 200, scale=1.0)
    backend = RecordingBackend.from_window_handle(win)
    assert (backend.width, backend.height) == (320, 200)


def test_from_window_handle_cpu_reference_renders():
    from rfw_tpu.render.cpu_reference import CpuReferenceBackend
    from rfw_tpu.scene.camera import Camera3D

    win = HeadlessWindow(16, 8)
    backend = CpuReferenceBackend.from_window_handle(win)
    assert (backend.width, backend.height) == (16, 8)
    backend.synchronize()
    frame = backend.render(None, Camera3D().get_view(16, 8))
    assert frame.shape == (8, 16, 4)


def test_from_window_handle_tpu_backend_sizes():
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings

    win = HeadlessWindow(32, 16, scale=2.0)
    backend = TpuBackend.from_window_handle(
        win, settings=TpuSettings(samples_per_frame=1, max_bounces=1))
    # scale 2.0 -> physical render resolution doubles (ScaleMode::HighDPI)
    assert (backend.width, backend.height) == (64, 32)


# ---------------------------------------------------------------------------
# BrowserWindow: the live provider, driven over plain HTTP (no browser)
# ---------------------------------------------------------------------------
def test_browser_window_round_trip():
    win = BrowserWindow(32, 16)
    try:
        # page serves
        page = urllib.request.urlopen(win.url, timeout=10).read()
        assert b"frame.png" in page

        # frame present -> served as PNG
        frame = np.zeros((16, 32, 4), np.uint8)
        frame[..., 0] = 200
        frame[..., 3] = 255
        win.present(frame)
        png = urllib.request.urlopen(win.url + "frame.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"

        # browser events -> winit mirror
        def post(payload):
            req = urllib.request.Request(
                win.url + "event", json.dumps(payload).encode(),
                {"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=10).read()

        post({"t": "key", "code": "KeyW", "down": 1})
        post({"t": "btn", "b": 0, "down": 1})
        post({"t": "move", "x": 5, "y": 6, "dx": 1, "dy": 2})
        post({"t": "wheel", "dx": 0, "dy": -3})
        post({"t": "close"})
        evs = win.poll_events()
        assert KeyboardInput(
            ElementState.PRESSED, VirtualKeyCode.W) in evs
        assert MouseInput(ElementState.PRESSED, MouseButton.LEFT) in evs
        assert CursorMoved(5.0, 6.0) in evs
        assert MouseMotion(1.0, 2.0) in evs
        assert MouseWheel(0.0, -3.0, pixel_delta=True) in evs
        assert CloseRequested() in evs
    finally:
        win.close()


def test_browser_window_drives_full_loop():
    inst, _ = _instance(32, 16)
    win = BrowserWindow(32, 16)
    try:
        # queue a key press then a close, as the page's JS would
        win._push({"t": "key", "code": "Space", "down": 1})
        frames = []

        def probe(world):
            frames.append(world.get(KeyState).pressed(VirtualKeyCode.Space))
            if len(frames) == 2:
                win._push({"t": "close"})

        inst.with_system(probe, Stage.UPDATE)
        n = inst.run_windowed(win, max_frames=10)
        assert frames[0] is True
        assert 2 <= n <= 10
        assert win._frame_png is not None  # frames were presented
        assert win.closed
    finally:
        win.close()
