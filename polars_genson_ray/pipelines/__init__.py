"""polars_genson_ray.pipelines"""
