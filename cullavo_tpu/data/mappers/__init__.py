from cullavo_tpu.data.mappers.eval_mappers import (PanopticEvalMapper,
                                                   RefCOCOEvalMapper,
                                                   SemSegEvalMapper,
                                                   VQAEvalMapper)
from cullavo_tpu.data.mappers.train_mappers import (InstanceTrainMapper,
                                                    SemanticTrainMapper)

__all__ = ["SemSegEvalMapper", "PanopticEvalMapper", "RefCOCOEvalMapper",
           "VQAEvalMapper", "SemanticTrainMapper", "InstanceTrainMapper"]
