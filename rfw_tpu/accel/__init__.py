from rfw_tpu.accel.bvh_cpu import BvhNodes, build_bvh_sah
from rfw_tpu.accel.lbvh import build_lbvh_device
