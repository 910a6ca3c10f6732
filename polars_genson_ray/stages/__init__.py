"""polars_genson_ray.stages"""
