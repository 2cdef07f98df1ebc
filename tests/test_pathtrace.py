"""O23 stretch: path tracer determinism + radiance sanity."""

import numpy as np
import pandas as pd

from optimizing_spark.operators import raster
from optimizing_spark.sources import datagen


def _scene():
    # a floor-ish big sphere, a lit sphere, and a plain one
    return pd.DataFrame({
        "obj_id": [0, 1, 2],
        "cx": [50.0, 50.0, 30.0],
        "cy": [-1000.0, 70.0, 40.0],
        "cz": [150.0, 150.0, 150.0],
        "radius": [1000.0, 10.0, 12.0],
        "emit": [0.0, 5.0, 0.0],
        "albedo": [0.7, 0.0, 0.5],
    })


def test_pathtrace_deterministic_and_sane(spark):
    rays_pd = datagen.rays_pandas(width=8, height=8, samples=2)
    rays = spark.createDataFrame(rays_pd)
    scene = spark.createDataFrame(_scene())
    a = raster.pathtrace(rays, scene, max_depth=3).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert len(a) == len(rays_pd)
    assert (a.radiance >= 0).all()
    assert a.radiance.max() > 0  # something sees the light
    b = raster.pathtrace(rays.repartition(7), scene, max_depth=3).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert np.allclose(a.radiance.to_numpy(), b.radiance.to_numpy())

    img = raster.render_raster(
        spark.createDataFrame(a), ["radiance"])
    assert img.count() == 64
