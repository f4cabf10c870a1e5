"""Multi-HOST (multi-process) training example: N coordinated processes,
one global mesh, one Trainer.

Demonstrates the production multi-host recipe (ARCHITECTURE.md #1):

1. every process calls ``parallel.initialize_distributed`` (here over a
   localhost coordinator with CPU devices standing in for real hosts --
   on a TPU pod each host runs this same script and jax discovers the
   topology);
2. everyone builds the SAME global mesh over ``jax.devices()`` and the
   SAME Trainer; collectives cross process boundaries unchanged;
3. checkpoints are written by process 0 only, logs report from process
   0 only, and the replicated validation metrics agree bit-for-bit on
   every host;
4. host-fed inputs go per-host: ``parallel.shard_batch_local`` feeds a
   leading-sharded global batch where each process materialises ONLY
   its own rows.

Run (self-launching: the parent spawns the 2 workers):

    python examples/multihost_training.py
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def worker(coordinator: str, process_id: int, out_path: str) -> None:
    import jax

    # CPU stand-in for one "host" (on a real pod, drop these two lines)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROCESS)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from qbold_vi_tpu.parallel import initialize_distributed, make_mesh

    initialize_distributed(coordinator, N_PROCESSES, process_id)
    mesh = make_mesh(jax.devices())   # ALL global devices
    print(f"[proc {process_id}] mesh over {len(jax.devices())} devices "
          f"({jax.process_count()} processes)", flush=True)

    import dataclasses

    from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,
                                     SynthParams, TrainConfig)
    from qbold_vi_tpu.train.trainer import Trainer

    cfg = QBoldConfig(
        scan=ScanParams(simulate_noise=False),
        synth=SynthParams(sample_size=60),
        model=ModelConfig(no_units=8, no_intermediate_layers=1,
                          use_mvg=True, student_t_df=200.0,
                          predict_log_data=False),
        train=TrainConfig(no_pt_epochs=2, pt_batch_size=16,
                          pt_on_device_synth=True,   # streaming: each
                          # device generates its own sub-batch locally
                          save_directory=os.path.dirname(out_path),
                          swa_start=1, swa_period=1),
    )
    trainer = Trainer(cfg, mesh=mesh)   # logs + checkpoints: process 0
    trainer.pretrain()
    val = trainer.pretrain_val_metrics(fold=True)
    print(f"[proc {process_id}] val_loss={val['val_loss']:.4f} "
          f"(replicated -- every host sees the same value)", flush=True)
    with open(out_path, "w") as f:
        json.dump({"process": process_id, "val_loss": val["val_loss"]}, f)


def main() -> None:
    if len(sys.argv) > 1:    # worker invocation
        worker(sys.argv[1], int(sys.argv[2]), sys.argv[3])
        return
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    workdir = tempfile.mkdtemp(prefix="qbold_mh_example_")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         f"localhost:{port}", str(pid), os.path.join(workdir, f"p{pid}.json")],
        env=env) for pid in range(N_PROCESSES)]
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    vals = [json.load(open(os.path.join(workdir, f"p{pid}.json")))
            for pid in range(N_PROCESSES)]
    assert vals[0]["val_loss"] == vals[1]["val_loss"], vals
    ckpt = os.path.join(workdir, "pt_model.msgpack")
    assert os.path.isfile(ckpt), "process-0 checkpoint missing"
    print(f"multihost example ok: {N_PROCESSES} processes agreed on "
          f"val_loss={vals[0]['val_loss']:.4f}; checkpoint at {ckpt}")


if __name__ == "__main__":
    main()
