"""Multi-host execution path (SURVEY §2.9 ICI/DCN row).

Launches TWO real OS processes that form one ``jax.distributed`` CPU
cluster (2 virtual devices each -> a global 4-device mesh) and run the
halo-exchange sharded Mlincomb through ``make_mesh(multihost=True)`` —
the code path production multi-host TPU pods take, exercised for real
instead of staying dead wiring.
"""
import os
import socket
import subprocess
import sys



def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    # strip the TPU-tunnel sitecustomize triggers: its register() call
    # initializes jax backends at interpreter start, which breaks
    # jax.distributed.initialize (must run before any backend init)
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH",
                             "PALLAS_AXON_POOL_IPS", "LIBTPU_INIT_ARGS")}
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "multihost sharded lincomb OK" in out, out[-3000:]
