"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process contributes 2 virtual CPU devices; the pair forms one global
4-device mesh.  Runs the halo-exchange sharded Mlincomb on a banded DEP and
checks the (replicated) result norm against the host serial computation.
Exit code 0 == success.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# distributed init MUST precede any backend touch — importing neptpu runs
# module-level jnp code, so initialize first (the same call make_mesh's
# multihost=True path performs when used at the top of a program)
import jax.distributed  # noqa: E402

jax.distributed.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import neptpu
    from neptpu.parallel import (ShardedDiaBank, make_mesh, shard_vector,
                                 sharded_dia_lincomb)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(multihost=True)  # no-op init (launcher-style), global mesh
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()  # global device list

    n = 512
    nep = neptpu.nep_gallery("dep0_tridiag", n)
    bank = nep.bank
    rng = np.random.default_rng(0)
    W = rng.standard_normal((n, bank.nterms))

    ndev = 4
    sb = ShardedDiaBank(bank, ndev).device_put(mesh)
    Ws = jax.make_array_from_callback(
        (ndev, sb.blk, bank.nterms),
        NamedSharding(mesh, P("rows")),
        lambda idx: np.asarray(shard_vector(W, ndev, sb.blk))[idx])
    y = sharded_dia_lincomb(sb, Ws, mesh)
    nrm = float(jax.jit(lambda y: (y * y).sum() ** 0.5)(y))

    data = np.asarray(bank._host_data if hasattr(bank, "_host_data")
                      else bank.data)
    y_ref = np.zeros(n)
    r = np.arange(n)
    for i in range(bank.nterms):
        for j, off in enumerate(bank.offsets):
            rows = r[: n - off] if off >= 0 else r[-off:]
            y_ref[rows] += data[i, j][rows] * W[rows + off, i]
    ref = float(np.linalg.norm(y_ref))
    assert abs(nrm - ref) < 1e-8 * ref, (nrm, ref)
    print(f"[proc {jax.process_index()}] multihost sharded lincomb OK "
          f"norm={nrm:.6f}")


if __name__ == "__main__":
    main()
