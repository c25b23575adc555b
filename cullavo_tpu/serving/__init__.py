from cullavo_tpu.serving.engine import Request, ServingEngine

__all__ = ["EngineRunner", "Request", "ServingEngine", "make_server"]


def __getattr__(name):
    # server pulls in http.server/threading — load lazily
    if name in ("EngineRunner", "make_server"):
        from cullavo_tpu.serving import server

        return getattr(server, name)
    raise AttributeError(name)
