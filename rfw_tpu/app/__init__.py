from rfw_tpu.app.ecs import Scheduler, Stage
from rfw_tpu.app.events import Events
from rfw_tpu.app.input import Input
from rfw_tpu.app.timer import GameTimer
from rfw_tpu.app.instance import Instance, Plugin, RenderSystem
from rfw_tpu.app.window import (
    BrowserWindow,
    DeviceEvent,
    DeviceEvents,
    ElementState,
    HeadlessWindow,
    InputBundle,
    KeyState,
    MouseButton,
    MouseState,
    ResizeEvent,
    ResizeEvents,
    VirtualKeyCode,
    WindowData,
    WindowEvent,
    WindowEvents,
    WindowHandle,
)
