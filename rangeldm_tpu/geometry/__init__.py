from rangeldm_tpu.geometry.sensors import (  # noqa: F401
    SensorSpec, get_spec, kitti360_spec, nuscenes_spec,
    kitti360_vanilla_spec, stf_spec,
)
from rangeldm_tpu.geometry.projection import (  # noqa: F401
    project, project_np, process_miss_value, process_miss_value_np,
    normalize, normalize_np, range_image, range_image_np, pad_points,
    encode_range, decode_range,
)
from rangeldm_tpu.geometry.inverse import (  # noqa: F401
    to_point_cloud, to_point_cloud_masked,
)
from rangeldm_tpu.geometry.voxelize import (  # noqa: F401
    to_voxel, splat_points_to_volumes,
)
