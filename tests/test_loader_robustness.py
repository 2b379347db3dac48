"""EpisodeLoader robustness + resume semantics (review findings):

* a worker that keeps failing must RAISE in the consumer, not hang
  __iter__ forever on its unfilled claimed step;
* a resumed run passes start_step so the (seed, step) episode stream
  CONTINUES instead of replaying from 0;
* round_to_data_mesh rounds UP on the data axis only.
"""

import numpy as np
import pytest

from clip_fsar_tpu.data.episodes import EpisodeLoader


class _OkSampler:
    def __init__(self, wid):
        self.step = None

    def reseed_for_slot(self, step, slot):
        self.step = step

    def sample_episode(self):
        # an "episode" that encodes the step it came from
        return {"step": np.asarray([self.step], np.int64)}


class _FailingSampler(_OkSampler):
    def sample_episode(self):
        raise IOError("decode failed for every retry")


def test_worker_error_propagates_instead_of_hanging():
    loader = EpisodeLoader(lambda wid: _FailingSampler(wid), episodes_per_step=1, num_workers=2, num_steps=4)
    with pytest.raises(RuntimeError, match="episode worker failed"):
        next(iter(loader))
    loader.close()


def test_start_step_continues_the_stream():
    with EpisodeLoader(lambda wid: _OkSampler(wid), episodes_per_step=2, num_workers=2, num_steps=3) as fresh:
        first = [int(b["step"][0]) for b in fresh]
    assert first == [0, 1, 2]
    # resume at step 2: stream continues with global steps 2, 3, 4
    with EpisodeLoader(lambda wid: _OkSampler(wid), episodes_per_step=2, num_workers=2, num_steps=3, start_step=2) as resumed:
        cont = [int(b["step"][0]) for b in resumed]
    assert cont == [2, 3, 4]


def test_round_to_data_mesh_uses_data_axis():
    import jax
    from jax.sharding import Mesh

    from clip_fsar_tpu.parallel.mesh import data_axis_size, round_to_data_mesh

    devs = np.asarray(jax.devices())
    n = len(devs)
    mesh1d = Mesh(devs, ("data",))
    assert data_axis_size(mesh1d) == n
    assert round_to_data_mesh(1, mesh1d) == n
    assert round_to_data_mesh(n + 1, mesh1d) == 2 * n  # rounds UP

    if n >= 2 and n % 2 == 0:
        mesh2d = Mesh(devs.reshape(n // 2, 2), ("data", "model"))
        # the model axis must not inflate the batch
        assert data_axis_size(mesh2d) == n // 2
        assert round_to_data_mesh(1, mesh2d) == n // 2
