"""Worker for the 2-process jax.distributed test (launched by
tests/test_distributed.py, one subprocess per simulated host).

Each process forces the CPU platform with 4 virtual local devices, joins the
distributed system via parallel.distributed.initialize, takes its host shard
of the global index space, and runs one globally-sharded eval step (dense
layer + global mean over a 'data'-sharded batch) on the 2x4-device mesh —
the multi-host analogue of the single-host dryrun in __graft_entry__.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from camouflage_multimodal_tpu.parallel.distributed import (  # noqa: E402
    global_batch_indices,
    initialize,
)


def main() -> None:
    pid = int(os.environ["WORKER_PROC_ID"])
    initialize(coordinator_address=os.environ["WORKER_COORD"],
               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    # host-sharded data loading: shards must tile [0, n) disjointly
    n = 16
    mine = global_batch_indices(n)
    assert len(mine) == n // 2
    assert set(mine) == set(range(pid, n, 2))

    # one sharded eval step over the global (2 hosts x 4 devices) mesh
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    feats = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
    local = feats[mine]
    global_batch = jax.make_array_from_process_local_data(sharding, local,
                                                          (n, 8))
    w = jnp.full((8, 4), 0.5, jnp.float32)

    @jax.jit
    def eval_step(x, w):
        return jnp.mean(x @ w)  # GSPMD inserts the cross-host reduction

    out = eval_step(global_batch, w)
    # the strided host shards assemble into a row-permutation of `feats`;
    # the global mean is permutation-invariant, so the check stays exact
    expected = float(np.mean(feats @ np.full((8, 4), 0.5, np.float32)))
    got = float(jax.device_get(out))
    assert abs(got - expected) < 1e-3, (got, expected)
    print(f"worker {pid} ok: global mean {got:.3f}")


if __name__ == "__main__":
    main()
