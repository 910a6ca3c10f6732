"""polars_genson_ray.state"""
