"""OpenAI API protocol objects (reference parity:
vllm/entrypoints/openai/protocol.py:56-240). Implemented as plain
dataclasses with explicit ``from_dict`` validation — pydantic is not
part of the TPU image, and the wire format is small enough that typed
parsing is clearer than schema magic.
"""
import dataclasses
import time
from typing import Any, Dict, List, Optional, Union

from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.utils import random_uuid


class ValidationError(ValueError):
    pass


def _take(d: Dict[str, Any], name: str, typ, default=None, required=False):
    if name not in d or d[name] is None:
        if required:
            raise ValidationError(f"field '{name}' is required")
        return default
    v = d[name]
    if typ is float and isinstance(v, int):
        v = float(v)
    if typ is not None and not isinstance(v, typ):
        raise ValidationError(
            f"field '{name}' must be {getattr(typ, '__name__', typ)}, "
            f"got {type(v).__name__}")
    return v


@dataclasses.dataclass
class ErrorResponse:
    message: str
    type: str = "invalid_request_error"
    code: int = 400
    object: str = "error"
    param: Optional[str] = None

    def to_dict(self):
        return dataclasses.asdict(self)


@dataclasses.dataclass
class ModelPermission:
    id: str = dataclasses.field(
        default_factory=lambda: f"modelperm-{random_uuid()}")
    object: str = "model_permission"
    created: int = dataclasses.field(default_factory=lambda: int(time.time()))
    allow_create_engine: bool = False
    allow_sampling: bool = True
    allow_logprobs: bool = True
    allow_search_indices: bool = False
    allow_view: bool = True
    allow_fine_tuning: bool = False
    organization: str = "*"
    group: Optional[str] = None
    is_blocking: bool = False


@dataclasses.dataclass
class ModelCard:
    id: str
    root: Optional[str] = None
    object: str = "model"
    created: int = dataclasses.field(default_factory=lambda: int(time.time()))
    owned_by: str = "vllm-quick-tpu"
    permission: List[ModelPermission] = dataclasses.field(
        default_factory=lambda: [ModelPermission()])

    def to_dict(self):
        return dataclasses.asdict(self)


@dataclasses.dataclass
class UsageInfo:
    prompt_tokens: int = 0
    total_tokens: int = 0
    completion_tokens: Optional[int] = 0

    def to_dict(self):
        return dataclasses.asdict(self)


def _sampling_kwargs(d: Dict[str, Any], max_tokens_default=16
                     ) -> Dict[str, Any]:
    """Shared sampling fields of completion + chat requests
    (reference protocol.py to_sampling_params)."""
    stop = d.get("stop")
    if stop is not None and not isinstance(stop, (str, list)):
        raise ValidationError("'stop' must be a string or list of strings")
    return dict(
        n=_take(d, "n", int, 1),
        best_of=_take(d, "best_of", int, None),
        presence_penalty=_take(d, "presence_penalty", float, 0.0),
        frequency_penalty=_take(d, "frequency_penalty", float, 0.0),
        repetition_penalty=_take(d, "repetition_penalty", float, 1.0),
        temperature=_take(d, "temperature", float, 1.0),
        top_p=_take(d, "top_p", float, 1.0),
        top_k=_take(d, "top_k", int, -1),
        min_p=_take(d, "min_p", float, 0.0),
        seed=_take(d, "seed", int, None),
        use_beam_search=_take(d, "use_beam_search", bool, False),
        length_penalty=_take(d, "length_penalty", float, 1.0),
        early_stopping=d.get("early_stopping", False),
        stop=stop,
        stop_token_ids=_take(d, "stop_token_ids", list, None),
        ignore_eos=_take(d, "ignore_eos", bool, False),
        max_tokens=_take(d, "max_tokens", int, max_tokens_default),
        skip_special_tokens=_take(d, "skip_special_tokens", bool, True),
        spaces_between_special_tokens=_take(
            d, "spaces_between_special_tokens", bool, True),
    )


@dataclasses.dataclass
class CompletionRequest:
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    stream: bool = False
    echo: bool = False
    logprobs: Optional[int] = None
    suffix: Optional[str] = None
    sampling: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CompletionRequest":
        if _take(d, "suffix", str) is not None:
            raise ValidationError("suffix is not currently supported")
        return cls(
            model=_take(d, "model", str, required=True),
            prompt=d.get("prompt") if d.get("prompt") is not None
            else _err("'prompt' is required"),
            stream=_take(d, "stream", bool, False),
            echo=_take(d, "echo", bool, False),
            logprobs=_take(d, "logprobs", int, None),
            sampling=_sampling_kwargs(d, max_tokens_default=16),
        )

    def to_sampling_params(self) -> SamplingParams:
        return SamplingParams(logprobs=self.logprobs,
                              prompt_logprobs=self.logprobs
                              if self.echo else None,
                              **self.sampling)


def _err(msg: str):
    raise ValidationError(msg)


@dataclasses.dataclass
class ChatCompletionRequest:
    model: str
    messages: List[Dict[str, str]]
    stream: bool = False
    add_generation_prompt: bool = True
    chat_template: Optional[str] = None
    sampling: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ChatCompletionRequest":
        messages = _take(d, "messages", list, required=True)
        for m in messages:
            if not isinstance(m, dict) or "role" not in m:
                raise ValidationError(
                    "each message must be {'role': ..., 'content': ...}")
        return cls(
            model=_take(d, "model", str, required=True),
            messages=messages,
            stream=_take(d, "stream", bool, False),
            add_generation_prompt=_take(d, "add_generation_prompt", bool,
                                        True),
            chat_template=_take(d, "chat_template", str, None),
            sampling=_sampling_kwargs(d, max_tokens_default=None),
        )

    def to_sampling_params(self, default_max_tokens: int) -> SamplingParams:
        kwargs = dict(self.sampling)
        if kwargs.get("max_tokens") is None:
            kwargs["max_tokens"] = default_max_tokens
        return SamplingParams(**kwargs)


# -- response builders (plain dicts; serialized with json.dumps) -----------

def completion_choice(index: int, text: str, logprobs=None,
                      finish_reason: Optional[str] = None) -> Dict:
    return {"index": index, "text": text, "logprobs": logprobs,
            "finish_reason": finish_reason}


def completion_response(model: str, choices: List[Dict],
                        usage: UsageInfo,
                        request_id: Optional[str] = None) -> Dict:
    return {
        "id": request_id or f"cmpl-{random_uuid()}",
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage.to_dict(),
    }


def completion_stream_chunk(request_id: str, model: str, created: int,
                            choices: List[Dict],
                            usage: Optional[UsageInfo] = None) -> Dict:
    out = {
        "id": request_id,
        "object": "text_completion",
        "created": created,
        "model": model,
        "choices": choices,
    }
    if usage is not None:
        out["usage"] = usage.to_dict()
    return out


def chat_message(role: str, content: str) -> Dict:
    return {"role": role, "content": content}


def chat_response(model: str, choices: List[Dict], usage: UsageInfo,
                  request_id: Optional[str] = None) -> Dict:
    return {
        "id": request_id or f"chatcmpl-{random_uuid()}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage.to_dict(),
    }


def chat_stream_chunk(request_id: str, model: str, created: int,
                      choices: List[Dict]) -> Dict:
    return {
        "id": request_id,
        "object": "chat.completion.chunk",
        "created": created,
        "model": model,
        "choices": choices,
    }
