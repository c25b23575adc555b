from cullavo_tpu.serving.engine import Request, ServingEngine

__all__ = ["Request", "ServingEngine"]
