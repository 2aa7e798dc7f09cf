"""CameraAgent: multi-view visual description (Layer 1).

Behavior parity with `src/agents/content_transform/camera_agent.py:9-138`:
one vision call covering all selected views, response split back into
per-camera sections by camera-name search with full-response fallback.

TPU-native difference: images stay numpy arrays end-to-end — the 6 views
batch through the ViT encoder in one forward (the reference JPEG-encodes
each frame to a base64 data-URL, `camera_agent.py:130-138`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from msc_tpu.agents.base import BaseAgent

_SYSTEM_PROMPT = """You are a camera vision expert analyzing driving scenes from multiple camera views.
You will be provided with multiple camera images from different viewpoints around a vehicle.

For EACH camera view, describe what you see focusing on:
- Vehicles (type, position, movement)
- Pedestrians and cyclists
- Road structure and markings
- Traffic signs and signals
- Environmental conditions
- Potential hazards

Be precise and structured in your observations for each camera.

CRITICAL INSTRUCTIONS:
- Analyze EACH camera view separately and thoroughly
- Include EVERY piece of information available - no summarization
- Be exhaustive and thorough - longer captions with more detail are better
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Write as if you're describing the scene to someone who can't see it
- Format your response with clear camera view labels"""


class CameraAgent(BaseAgent):
    """Processes camera images to extract visual features."""

    def process(self, images: List[np.ndarray], camera_names: List[str],
                context: Optional[Dict] = None) -> Dict[str, Any]:
        spec = self.prepare_call(images, camera_names, context)
        response = self.call_llm(**spec)
        return self.finish(response, images, camera_names)

    def prepare_call(self, images: List[np.ndarray],
                     camera_names: List[str],
                     context: Optional[Dict] = None) -> dict:
        """The one multi-view vision call as a spec, so the pipeline's
        fused path can batch it with other agents' calls."""
        import json

        user_content: List[dict] = []
        if context:
            user_content.append({
                "type": "text",
                "text": f"Context from other sensors:\n{json.dumps(context, indent=2)}\n\n",
            })
        user_content.append({
            "type": "text",
            "text": (f"Analyze all {len(camera_names)} camera views. "
                     "For each view, provide detailed observations:\n\n"),
        })
        for name in camera_names:
            user_content.append({"type": "text", "text": f"Camera: {name}"})
            user_content.append({"type": "image"})

        messages = [
            {"role": "system", "content": _SYSTEM_PROMPT},
            {"role": "user", "content": user_content},
        ]
        return dict(messages=messages, temperature=0.3,
                    task="camera_describe", images=images,
                    max_new_tokens=256)

    def finish(self, response: str, images: List[np.ndarray],
               camera_names: List[str],
               detections: Optional[List[dict]] = None) -> Dict[str, Any]:
        """detections: precomputed ``detect()`` output — the fused
        pipeline computes it on the host WHILE the batched model call
        decodes on device (async overlap, round-2 VERDICT item 8)."""
        response = self._append_detections(response, images, camera_names,
                                           detections)
        observations = self._split_by_camera(response, camera_names)
        return {
            "agent": self.agent_name,
            "modality": "camera",
            "camera_views": camera_names,
            "observations": observations,
            "full_response": response,
        }

    @staticmethod
    def detect(images: List[np.ndarray],
               camera_names: List[str]) -> List[dict]:
        """Pure-host pixel detection over all frames (no model call)."""
        from msc_tpu.serving.analytic import _detect_mock_objects

        detections = []
        for i, name in enumerate(camera_names):
            if i >= len(images):
                break
            direction = name.lower().removeprefix("cam_").replace("_", " ")
            for d in _detect_mock_objects(images[i]):
                detections.append({**d, "direction": direction})
        return detections

    @classmethod
    def _append_detections(cls, response: str, images: List[np.ndarray],
                           camera_names: List[str],
                           detections: Optional[List[dict]] = None) -> str:
        """Host-append a ``CAMERAS_JSON`` marker from the pixel detector —
        the camera data plane's numeric front end, mirroring the lidar
        agent's clustering + host-appended DETECTIONS_JSON design: the
        model call supplies prose, the detector supplies the structured
        object knowledge that camera-only ablations need downstream.

        Skipped when the backend already emitted the marker (the analytic
        backend is itself pixel-grounded, serving/analytic.py _camera).
        The detector recognizes the mock renderer's palette objects; on
        real imagery it returns nothing — a trained detector head slots
        in here for real-data deployments.
        """
        import json

        from msc_tpu.serving.analytic import CAM_MARKER

        if CAM_MARKER in response:
            # keep a backend-emitted marker only if its payload parses
            # (the analytic backend's is authoritative); a model-emitted
            # corrupt line is stripped and replaced by the detector's
            for line in response.splitlines():
                ls = line.strip()
                if ls.startswith(CAM_MARKER):
                    try:
                        json.loads(ls[len(CAM_MARKER):])
                        return response
                    except ValueError:
                        break
            response = "\n".join(
                l for l in response.splitlines()
                if not l.strip().startswith(CAM_MARKER)).rstrip()
        if detections is None:
            detections = cls.detect(images, camera_names)
        if not detections:
            return response
        return response + f"\n{CAM_MARKER} {json.dumps(detections)}"

    @staticmethod
    def _split_by_camera(response: str, camera_names: List[str]) -> Dict[str, str]:
        """Per-camera section splitting (parity with
        `camera_agent.py:77-119`): find each camera's name (raw or
        underscores-as-spaces), slice up to the next camera's mention;
        full response for every camera if no sections found."""
        response_lower = response.lower()
        if not any(n.lower() in response_lower for n in camera_names):
            return {name: response for name in camera_names}

        observations: Dict[str, str] = {}
        for i, name in enumerate(camera_names):
            start = -1
            for pattern in (name.lower(), name.replace("_", " ").lower()):
                idx = response_lower.find(pattern)
                if idx != -1:
                    start = idx
                    break
            if start == -1:
                observations[name] = (
                    f"(Analysis for {name} not clearly separated in response)")
                continue
            end = len(response)
            for nxt in camera_names[i + 1:]:
                for pattern in (nxt.lower(), nxt.replace("_", " ").lower()):
                    idx = response_lower.find(pattern, start + 1)
                    if idx != -1 and idx < end:
                        end = idx
                        break
            observations[name] = response[start:end].strip()
        return observations
