"""Offline batch-inference API (capability parity:
vllm/entrypoints/llm.py — the ``LLM`` class)."""
import itertools
from typing import List, Optional, Union

from tqdm import tqdm

from vllm_quick_tpu.engine.arg_utils import EngineArgs
from vllm_quick_tpu.engine.llm_engine import LLMEngine
from vllm_quick_tpu.outputs import RequestOutput
from vllm_quick_tpu.sampling_params import SamplingParams


class LLM:
    """Batched offline generation over a TPU mesh.

    Thin veneer over :class:`LLMEngine`: enqueue every request, then
    pump the engine's continuous-batching step loop until the last one
    finishes. Keyword arguments map 1:1 onto :class:`EngineArgs`.
    """

    def __init__(self, model: str, **engine_kwargs) -> None:
        engine_kwargs.setdefault("disable_log_stats", True)
        self.llm_engine = LLMEngine.from_engine_args(
            EngineArgs(model=model, **engine_kwargs))
        self._next_id = itertools.count()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer.tokenizer

    def set_tokenizer(self, tokenizer) -> None:
        self.llm_engine.tokenizer.tokenizer = tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        prefix_pos: Optional[Union[int, List[int]]] = None,
        use_tqdm: bool = True,
        lora_request=None,
    ) -> List[RequestOutput]:
        """Generate completions, ordered like the inputs."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = self._count_requests(prompts, prompt_token_ids)
        params = sampling_params or SamplingParams()

        for i in range(n):
            self.llm_engine.add_request(
                request_id=str(next(self._next_id)),
                prompt=None if prompts is None else prompts[i],
                sampling_params=params,
                prompt_token_ids=(None if prompt_token_ids is None
                                  else prompt_token_ids[i]),
                lora_request=lora_request,
                prefix_pos=(prefix_pos[i]
                            if isinstance(prefix_pos, list) else prefix_pos),
            )
        return self._drain(use_tqdm)

    @staticmethod
    def _count_requests(prompts, prompt_token_ids) -> int:
        if prompts is None and prompt_token_ids is None:
            raise ValueError(
                "need prompts and/or prompt_token_ids")
        if (prompts is not None and prompt_token_ids is not None
                and len(prompts) != len(prompt_token_ids)):
            raise ValueError(
                f"got {len(prompts)} prompts but "
                f"{len(prompt_token_ids)} prompt_token_ids")
        return len(prompts if prompts is not None else prompt_token_ids)

    def _drain(self, use_tqdm: bool) -> List[RequestOutput]:
        """Step the engine until every queued request completes."""
        pbar = tqdm(total=self.llm_engine.get_num_unfinished_requests(),
                    desc="Processed prompts") if use_tqdm else None
        done: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    done.append(out)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        done.sort(key=lambda o: int(o.request_id))
        return done
