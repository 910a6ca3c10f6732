"""Reshape operator tests (``stages/reshape.py``): schema-evolution
union-by-name and unpivot/melt. The SQL-oracled queries
(`events_union_by_name`, `lineitem_unpivot`) pin end-to-end values; these
pin the operator-level contracts (typed null fill, type promotion,
argument validation, melt layout)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from polars_genson_ray.stages.reshape import union_by_name, unpivot


def test_union_by_name_fills_typed_nulls(ray_session):
    a = rd.from_arrow(pa.table({"x": [1, 2], "y": ["a", "b"]}))
    b = rd.from_arrow(pa.table({"y": ["c"], "z": [1.5]}))
    out = union_by_name([a, b])
    df = out.to_pandas().sort_values("y").reset_index(drop=True)
    assert list(df.columns) == ["x", "y", "z"]
    assert df.y.tolist() == ["a", "b", "c"]
    assert df.x.tolist()[:2] == [1, 2] and np.isnan(df.x[2])
    assert np.isnan(df.z[0]) and df.z[2] == 1.5
    # schema is the unified one, stable for downstream operators
    sch = out.schema().base_schema
    assert sch.field("x").type == pa.int64()
    assert sch.field("z").type == pa.float64()


def test_union_by_name_promotes_types(ray_session):
    a = rd.from_arrow(pa.table({"v": pa.array([1, 2], pa.int32())}))
    b = rd.from_arrow(pa.table({"v": pa.array([3.5], pa.float64())}))
    df = union_by_name([a, b]).to_pandas().sort_values("v")
    assert df.v.tolist() == [1.0, 2.0, 3.5]


def test_union_by_name_single_and_empty():
    with pytest.raises(ValueError):
        union_by_name([])


def test_unpivot_layout(ray_session):
    t = pa.table({
        "id": [10, 20],
        "a": [1.0, 2.0],
        "b": [3.0, 4.0],
    })
    out = unpivot(
        rd.from_arrow(t), id_columns=["id"], value_columns=["a", "b"],
        variable_column="m", value_column="v",
    ).to_pandas().sort_values(["m", "id"]).reset_index(drop=True)
    assert list(out.columns) == ["id", "m", "v"]
    assert out.m.tolist() == ["a", "a", "b", "b"]
    assert out.v.tolist() == [1.0, 2.0, 3.0, 4.0]
    assert out.id.tolist() == [10, 20, 10, 20]


def test_unpivot_promotes_value_types(ray_session):
    t = pa.table({
        "id": [1],
        "i": pa.array([7], pa.int64()),
        "f": pa.array([0.5], pa.float64()),
    })
    out = unpivot(
        rd.from_arrow(t), id_columns=["id"], value_columns=["i", "f"]
    ).to_pandas()
    assert sorted(out.value.tolist()) == [0.5, 7.0]


def test_unpivot_requires_value_columns(ray_session):
    with pytest.raises(ValueError):
        unpivot(rd.from_arrow(pa.table({"id": [1]})),
                id_columns=["id"], value_columns=[])
