"""Minimal staged scheduler + resource world.

Reference: rfw/src/ecs/mod.rs:14-103 — bevy_ecs Schedule with run-once
Startup stages and PreUpdate/Update/PostUpdate per frame. The TPU rebuild
keeps the staging semantics with a deliberately small world: systems are
plain callables taking the `World` (a typed resource map). On-device work
is already data-parallel, so host-side system parallelism is not ported.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Dict, List, Optional, Type, TypeVar

T = TypeVar("T")


class Stage(enum.Enum):
    PRE_STARTUP = 0
    STARTUP = 1
    POST_STARTUP = 2
    PRE_UPDATE = 3
    UPDATE = 4
    POST_UPDATE = 5


_STARTUP = (Stage.PRE_STARTUP, Stage.STARTUP, Stage.POST_STARTUP)
_FRAME = (Stage.PRE_UPDATE, Stage.UPDATE, Stage.POST_UPDATE)


class World:
    """Typed resource map (the ECS entity layer collapses: scene objects
    live in Scene storages already)."""

    def __init__(self) -> None:
        self._resources: Dict[type, Any] = {}

    def insert(self, resource: Any) -> None:
        self._resources[type(resource)] = resource

    def get(self, ty: Type[T]) -> T:
        return self._resources[ty]

    def try_get(self, ty: Type[T]) -> Optional[T]:
        return self._resources.get(ty)

    def __contains__(self, ty: type) -> bool:
        return ty in self._resources


System = Callable[[World], None]


class Scheduler:
    def __init__(self) -> None:
        self._systems: Dict[Stage, List[System]] = {s: [] for s in Stage}
        self._startup_done = False

    def add_system(self, system: System, stage: Stage = Stage.UPDATE) -> None:
        self._systems[stage].append(system)

    def add_startup_system(self, system: System, stage: Stage = Stage.STARTUP) -> None:
        assert stage in _STARTUP
        self._systems[stage].append(system)

    def run(self, world: World) -> None:
        if not self._startup_done:
            for s in _STARTUP:
                for sys_fn in self._systems[s]:
                    sys_fn(world)
            self._startup_done = True
        for s in _FRAME:
            for sys_fn in self._systems[s]:
                sys_fn(world)
