"""polars_genson_ray.sources"""
