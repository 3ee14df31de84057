"""2-process multihost multi-LoRA: follower hosts replay the driver's
adapter slot assignments from their own disks (closes the round-3
LoRA-multihost gap; VERDICT r3 item 9). KV pools must match
bit-for-bit with an adapter active (see multihost_lora_proc.py)."""
import os
import socket
import subprocess
import sys

import pytest

from tests.lora.test_lora import _make_adapter
from tests.utils import make_tiny_llama_dir

_HELPER = os.path.join(os.path.dirname(__file__), "multihost_lora_proc.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(240)
def test_two_process_lora_sync():
    model_dir = make_tiny_llama_dir()
    adapter_dir, _ = _make_adapter(model_dir, seed=11)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _HELPER, str(rank), str(port), model_dir,
             adapter_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=210)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {rank} failed (rc={p.returncode}):\n{out[-4000:]}")
        assert f"RANK{rank}_OK" in out, out[-4000:]
