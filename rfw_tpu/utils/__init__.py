from rfw_tpu.utils.collections import FlaggedStorage, TrackedStorage
from rfw_tpu.utils.track import Tracked
from rfw_tpu.utils.timing import Timer, Averager
from rfw_tpu.utils.task import TaskPool
