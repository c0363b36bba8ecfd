from rfw_tpu.render.pack import TraceScene, pack_trace_scene
from rfw_tpu.render.intersect import bvh_closest_hit, bvh_occluded, brute_force_closest
