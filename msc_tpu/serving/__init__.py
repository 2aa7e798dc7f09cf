from msc_tpu.serving.client import ChatClient, make_backend

__all__ = ["ChatClient", "make_backend"]
