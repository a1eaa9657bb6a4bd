from vgpmp_tpu.sdf.grid import SdfGrid, nearest_distance, trilinear_distance, distance

__all__ = ["SdfGrid", "nearest_distance", "trilinear_distance", "distance"]
