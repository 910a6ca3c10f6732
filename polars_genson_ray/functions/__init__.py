"""polars_genson_ray.functions"""
