from vllm_quick_tpu.parallel.mesh import (ParallelContext, get_mesh,
                                          make_mesh)

__all__ = ["ParallelContext", "get_mesh", "make_mesh"]
