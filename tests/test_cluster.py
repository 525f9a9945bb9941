"""Cluster topology planning (pure parts; multi-process runtime is
exercised by the driver's dryrun, not here)."""

import numpy as np
import pytest

import jax

from gnuais_tpu.parallel.cluster import (global_counter_sum,
                                         local_stream_rows,
                                         make_cluster_mesh, plan_mesh_axes)


def test_plan_mesh_axes():
    assert plan_mesh_axes(8, 4, 1) == (8, 1)
    assert plan_mesh_axes(8, 4, 2) == (4, 2)
    assert plan_mesh_axes(8, 4, 4) == (2, 4)
    with pytest.raises(ValueError):
        plan_mesh_axes(8, 4, 8)   # halos would cross DCN
    with pytest.raises(ValueError):
        plan_mesh_axes(6, 4, 4)   # not divisible


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cluster_mesh_and_rows():
    mesh = make_cluster_mesh(time_shards=2)
    assert mesh.shape == {"streams": 4, "time": 2}
    rows = local_stream_rows(mesh, 64)
    assert rows == slice(0, 64)   # single process owns everything


def test_counter_sum_single_process():
    x = np.array([1, 2, 3])
    assert np.array_equal(global_counter_sum(x), x)
