"""msc_tpu — TPU-native multimodal scene captioning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
AgustinRoca/multimodal-scene-captioning (see SURVEY.md):

- 4-layer agentic captioning pipeline (content transform -> seed features ->
  iterative refinement -> structured caption), reference `src/pipeline.py:84-187`.
- On-TPU VLM serving (batched ViT prefill, paged-KV autoregressive decode,
  constrained JSON decoding) replacing the reference's Azure OpenAI HTTPS calls
  (`src/agents/base_agent.py:14-58`).
- Fused XLA/Pallas data-plane kernels replacing the reference's per-point
  Python loops (`src/agents/content_transform/lidar_agent.py`).
- nuScenes-MQA evaluation stack with modality ablations
  (`src/evaluation_framework.py`).
"""

__version__ = "0.1.0"

from msc_tpu.config import ModelConfig, ModalityConfig, MeshConfig, EvalConfig


def __getattr__(name):
    # Lazy: pipeline pulls in jax; keep bare `import msc_tpu` light.
    if name == "SemanticCaptioningPipeline":
        from msc_tpu.pipeline import SemanticCaptioningPipeline

        return SemanticCaptioningPipeline
    raise AttributeError(name)

__all__ = [
    "ModelConfig",
    "ModalityConfig",
    "MeshConfig",
    "EvalConfig",
    "SemanticCaptioningPipeline",
    "__version__",
]
