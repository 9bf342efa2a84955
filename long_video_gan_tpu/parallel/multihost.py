"""Multi-host (multi-process) SPMD initialization.

The reference is multi-node via torchrun + NCCL process groups
(/root/reference/torch_utils/distributed.py:42-74, README.md:88-99). The
TPU-native equivalent is single-controller-per-host JAX: every host runs the
same program, `jax.distributed.initialize` forms the global device world, and
all cross-host communication is XLA collectives inserted by GSPMD inside the
compiled steps — there are no explicit sends anywhere in this codebase.

Launch recipe (one process per host):

    LVG_COORDINATOR=host0:1234 LVG_NUM_PROCESSES=4 LVG_PROCESS_ID=$i \
        python train_lres.py --dataset=... --batch=64

On Cloud TPU pods the three env vars can be omitted and
`LVG_COORDINATOR=auto` used instead — jax.distributed auto-detects the pod
topology. Without LVG_COORDINATOR the run is single-host (no-op).

Per-host responsibilities once initialized:
  * data: each host loads total_batch // process_count samples
    (shard_id=process_index in data/loader.py);
  * device placement: `mesh.shard_batch` assembles the global batch from
    process-local rows via jax.make_array_from_process_local_data;
  * filesystem: only process 0 writes checkpoints/stats/samples (the train
    CLIs gate on `is_main_process()`).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Env-gated jax.distributed.initialize. Returns True if multi-host.

    Must be called before any other JAX API touches the backend. Idempotent:
    repeated calls (or an already-initialized runtime) are no-ops.
    """
    coordinator = os.environ.get("LVG_COORDINATOR")
    if not coordinator:
        return False

    import jax

    kwargs = {}
    if coordinator != "auto":
        kwargs["coordinator_address"] = coordinator
    if "LVG_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["LVG_NUM_PROCESSES"])
    if "LVG_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["LVG_PROCESS_ID"])
    if "LVG_LOCAL_DEVICE_IDS" in os.environ:
        kwargs["local_device_ids"] = [
            int(x) for x in os.environ["LVG_LOCAL_DEVICE_IDS"].split(",")]
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def local_batch_size(total_batch: int) -> int:
    """Per-host share of the global batch (reference train_lres.py:65-67)."""
    import jax

    n = jax.process_count()
    assert total_batch % n == 0, (
        f"total batch {total_batch} not divisible by {n} hosts")
    return total_batch // n
