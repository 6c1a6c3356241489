from .sampling import furthest_point_sample, furthest_point_sample_with_dist
from .grouping import (ball_query, gather_points, group_points,
                       query_and_group)
from .interpolate import three_nn, three_interpolate, three_nn_interpolate
from .nms import aligned_3d_nms, nms_2d, batched_nms_2d
from .msda import multi_scale_deformable_attention
from .roi_align import roi_align

__all__ = [
    'furthest_point_sample', 'furthest_point_sample_with_dist', 'ball_query',
    'gather_points', 'group_points', 'query_and_group', 'three_nn',
    'three_interpolate', 'three_nn_interpolate', 'aligned_3d_nms', 'nms_2d',
    'batched_nms_2d', 'multi_scale_deformable_attention', 'roi_align',
]
