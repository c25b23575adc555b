from cullavo_tpu.data.mappers.eval_mappers import (PanopticEvalMapper,
                                                   RefCOCOEvalMapper,
                                                   SemSegEvalMapper,
                                                   VQAEvalMapper)

__all__ = ["SemSegEvalMapper", "PanopticEvalMapper", "RefCOCOEvalMapper",
           "VQAEvalMapper"]
