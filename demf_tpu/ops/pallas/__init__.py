from .fps import furthest_point_sample_pallas
