from rangeldm_tpu.metrics.mmd import compute_mmd  # noqa: F401
from rangeldm_tpu.metrics.jsd import compute_jsd, jsd_2d  # noqa: F401
from rangeldm_tpu.metrics.frd import compute_frd  # noqa: F401
from rangeldm_tpu.metrics.chamfer import chamfer_distance  # noqa: F401
from rangeldm_tpu.metrics.histogram import (  # noqa: F401
    kitti_histogram, nuscenes_histogram, point_cloud_to_histogram,
)
