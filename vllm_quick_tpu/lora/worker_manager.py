"""Per-worker LoRA orchestration (reference parity:
vllm/lora/worker_manager.py — LRUCacheWorkerLoRAManager: load-on-demand
from disk per scheduled batch; device capacity = max_loras, host cache
= max_cpu_loras)."""
from typing import Dict, List, Optional, Set

from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.lora.models import LoRAModel, LoRAModelManager
from vllm_quick_tpu.lora.request import LoRARequest

logger = init_logger(__name__)


class WorkerLoRAManager:

    def __init__(self, params, model, lora_config, dtype,
                 mesh=None) -> None:
        self.lora_config = lora_config
        self.manager = LoRAModelManager(params, model, lora_config,
                                        dtype=dtype, mesh=mesh)
        self.max_cpu_loras = (lora_config.max_cpu_loras
                              or lora_config.max_loras)
        # Host-side deserialized adapter cache, LRU by insertion order.
        self._cpu_cache: Dict[int, LoRAModel] = {}

    def _get_cpu(self, req: LoRARequest) -> LoRAModel:
        lm = self._cpu_cache.get(req.lora_int_id)
        if lm is None:
            logger.info("Loading LoRA %s from %s", req.lora_name,
                        req.lora_local_path)
            lm = LoRAModel.from_local_checkpoint(req.lora_local_path,
                                                 req.lora_int_id)
            if len(self._cpu_cache) >= self.max_cpu_loras:
                evict = next(iter(self._cpu_cache))
                del self._cpu_cache[evict]
            self._cpu_cache[req.lora_int_id] = lm
        else:
            # refresh LRU position
            del self._cpu_cache[req.lora_int_id]
            self._cpu_cache[req.lora_int_id] = lm
        return lm

    def set_active_loras(self, requests: Set[LoRARequest]
                         ) -> Dict[int, int]:
        """Activate the batch's adapters; returns lora_id -> slot."""
        models = [self._get_cpu(r) for r in requests]
        return self.manager.ensure_loaded(models)

    def sync_slots(self, directives) -> None:
        """Follower-host mirror of the driver's slot assignments:
        ``directives`` is a list of (slot, lora_int_id, local_path)
        tuples from the driver's per-step payload. Each follower loads
        the same checkpoint from its own filesystem into the same slot
        with the same write code, so the stacked tensors match the
        driver's bit for bit. Idempotent (no-op for slots already
        holding the right adapter)."""
        for slot, lora_id, path in directives:
            if self.manager.slot_ids[slot] == lora_id:
                self.manager.slot_clock[slot] = self.manager._clock
                continue
            lm = self._get_cpu(LoRARequest(str(lora_id), lora_id, path))
            self.manager.load_into_slot(slot, lm)

    def add_lora(self, req: LoRARequest) -> bool:
        self.set_active_loras({req})
        return True

    def remove_lora(self, lora_id: int) -> bool:
        self._cpu_cache.pop(lora_id, None)
        return self.manager.remove(lora_id)

    def list_loras(self) -> List[int]:
        return self.manager.list_ids()
