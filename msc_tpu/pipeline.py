"""SemanticCaptioningPipeline: the 4-layer orchestration.

Behavior parity with `src/pipeline.py:34-195`:
  Layer 1 content transformation with modality dropout (camera-index
  subsetting at `:114-116`; cross-modal only when >1 modality, `:133-136`)
  -> Layer 2 seed captions over ``{"observations": [...]}`` (`:142-144`)
  -> Layer 3 iterative refinement (max 3 iterations, `:75-77`)
  -> Layer 4 structured caption.
Result dict keys are unchanged (``pipeline_stages``, ``structured_caption``,
``refinement_metadata``) so the evaluation stack's accesses
(`src/evaluation_framework.py:559`) work as-is.

TPU-native differences: the model backend is local (analytic / on-TPU VLM
instead of Azure HTTPS), the LiDAR/image data plane runs on device, the 5
seed-focus calls batch into one device call, and every stage is timed
(``pipeline.timer``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from msc_tpu.agents import (
    CameraAgent,
    CaptionGenerator,
    CrossModalAgent,
    EditorAgent,
    IterativeRefinementController,
    LiDARAgent,
    SceneGraphAgent,
    SeedFeatureAgent,
    SuggesterAgent,
)
from msc_tpu.config import LiDARConfig, ModalityConfig, ModelConfig
from msc_tpu.serving.client import ChatClient, make_backend
from msc_tpu.utils.tracing import StageTimer


class SemanticCaptioningPipeline:
    """Complete semantic captioning pipeline."""

    def __init__(self, config: Optional[ModelConfig] = None,
                 lidar_config: Optional[LiDARConfig] = None,
                 backend=None, verbose: bool = True,
                 parallel_l1: bool = False):
        """parallel_l1: dispatch the independent Layer-1 agents (camera,
        lidar, scene-graph) on threads — the reference runs them strictly
        serially (`src/pipeline.py:112-131`).  Off by default here because
        the dev tunnel degrades under concurrent device access (PERF.md);
        pair with a ContinuousBatcher backend on direct-attached TPUs."""
        self.config = config or ModelConfig()
        self.lidar_config = lidar_config or LiDARConfig()
        # prompt-flags sidecar: a checkpoint trained with classify hints
        # must be served with hint prompts — and one trained without must
        # never see them — regardless of the caller's environment
        # (training/distill.py writes `<ckpt>.flags` at save time).  An
        # explicit MSC_CLASSIFY_HINTS still wins; checkpoints with no
        # flags file (pre-round-4) are untouched.
        import dataclasses as _dc
        import os as _os

        flags_path = (getattr(self.config, "vlm_ckpt", "") or "") + ".flags"
        if ("MSC_CLASSIFY_HINTS" not in _os.environ
                and _os.path.isfile(flags_path)):
            with open(flags_path) as f:
                flags = dict(l.strip().split("=", 1) for l in f
                             if "=" in l)
            if "classify_hints" in flags:
                self.lidar_config = _dc.replace(
                    self.lidar_config,
                    classify_hints=flags["classify_hints"] == "1")
        # the fact-line format is a prompt contract too: a checkpoint
        # trained on v3 fact lines ("Distance for this question: ...")
        # must be served with them, and a pre-v3 checkpoint must never
        # see them.  Explicit MSC_FACTS wins (set_facts_version no-ops).
        if _os.path.isfile(flags_path):
            with open(flags_path) as f:
                flags = dict(l.strip().split("=", 1) for l in f
                             if "=" in l)
            from msc_tpu.serving.analytic import set_facts_version
            set_facts_version(flags.get("facts", "v2"))
        self.parallel_l1 = parallel_l1
        self.verbose = verbose
        self.timer = StageTimer()
        from msc_tpu.utils.jax_setup import warmup_device_transfer

        warmup_device_transfer()
        if backend is None:
            backend = make_backend(self.config)
        self.client = ChatClient(backend)
        self._initialize_agents()

    def _initialize_agents(self):
        cfg = self.config
        # Layer 1: content transformation
        self.camera_agent = CameraAgent(self.client, cfg.vision_model, "CameraAgent")
        self.lidar_agent = LiDARAgent(self.client, cfg.small_model, "LiDARAgent",
                                      lidar_config=self.lidar_config)
        self.scene_graph_agent = SceneGraphAgent(self.client, cfg.small_model,
                                                 "SceneGraphAgent")
        self.cross_modal_agent = CrossModalAgent(self.client, cfg.small_model,
                                                 "CrossModalAgent")
        # Layer 2: seed features
        self.seed_agent = SeedFeatureAgent(self.client, cfg.small_model)
        # Layer 3: refinement (max 3 iterations, parity pipeline.py:75-77)
        self.suggester = SuggesterAgent(self.client, cfg.small_model, "SuggesterAgent")
        self.editor = EditorAgent(self.client, cfg.small_model, "EditorAgent")
        self.refinement_system = IterativeRefinementController(
            self.suggester, self.editor, max_iterations=3, verbose=False,
            fused=getattr(cfg, "fused_calls", False))
        # Layer 4: caption generation
        self.caption_generator = CaptionGenerator(self.client, cfg.small_model,
                                                  "CaptionGenerator")
        self.caption_generator.mqa_template = getattr(
            cfg, "mqa_template", False)

    def _log(self, msg: str):
        if self.verbose:
            print(msg)

    # ------------------------------------------------------------------
    def process_scene(self,
                      images: List[np.ndarray],
                      camera_names: List[str],
                      point_cloud: Optional[np.ndarray] = None,
                      annotations: Optional[List[Dict]] = None,
                      modality_config: Optional[ModalityConfig] = None
                      ) -> Dict[str, Any]:
        """Process a complete scene through the 4-layer pipeline."""
        if modality_config is None:
            modality_config = ModalityConfig()

        results: Dict[str, Any] = {"pipeline_stages": {}}

        # ---- Layer 1: content transformation with modality dropout ----
        self._log("Layer 1: Content Transformation...")
        if modality_config.use_cameras and images and modality_config.camera_indices:
            images = [images[i] for i in modality_config.camera_indices]
            camera_names = [camera_names[i]
                            for i in modality_config.camera_indices]

        layer1_outputs = None
        if (getattr(self.config, "fused_calls", False)
                and not self.parallel_l1):
            try:
                layer1_outputs = self._layer1_fused(
                    images, camera_names, point_cloud, annotations,
                    modality_config)
            except Exception as e:
                self._log(f"  fused Layer 1 failed ({e}); serial fallback")
                layer1_outputs = None
        if layer1_outputs is not None:
            results["pipeline_stages"]["layer1_content_transformation"] = \
                layer1_outputs
            return self._layers_2_to_4(results, layer1_outputs)

        tasks = []  # (name, thunk) in the reference's fixed output order

        if modality_config.use_cameras and images:
            tasks.append(("layer1.camera",
                          lambda: self.camera_agent.process(images,
                                                            camera_names)))
        if modality_config.use_lidar and point_cloud is not None:
            tasks.append(("layer1.lidar",
                          lambda: self.lidar_agent.process(point_cloud)))
        if modality_config.use_annotations and annotations:
            tasks.append(("layer1.scene_graph",
                          lambda: self.scene_graph_agent.process(annotations)))

        if self.parallel_l1 and len(tasks) > 1:
            # the L1 agents are mutually independent; run them concurrently
            # (output order stays camera, lidar, scene_graph)
            from concurrent.futures import ThreadPoolExecutor

            def run(named):
                name, thunk = named
                with self.timer.stage(name):
                    return thunk()

            with ThreadPoolExecutor(len(tasks),
                                    thread_name_prefix="msc-l1") as pool:
                layer1_outputs = list(pool.map(run, tasks))
        else:
            layer1_outputs = []
            for name, thunk in tasks:
                with self.timer.stage(name):
                    layer1_outputs.append(thunk())
                self._log(f"  {name} done")

        if len(layer1_outputs) > 1:
            with self.timer.stage("layer1.cross_modal"):
                layer1_outputs.append(
                    self.cross_modal_agent.facilitate_exchange(layer1_outputs))
            self._log("  CrossModalAgent coordinated information")

        results["pipeline_stages"]["layer1_content_transformation"] = layer1_outputs
        return self._layers_2_to_4(results, layer1_outputs)

    def _layer1_fused(self, images, camera_names, point_cloud, annotations,
                      modality_config) -> List[Dict]:
        """Layer 1 with fused dispatch (round-2 VERDICT item 3): batch 1
        coalesces the camera describe + cluster classify + scene-graph
        calls (they are mutually independent); batch 2 coalesces the
        lidar interpretation with the cross-modal synthesis (cross-modal
        reads the lidar structured report + marker, minus the
        interpretation prose that is still decoding — the trade the
        VERDICT endorses).  Output order and dict shapes are identical to
        the serial path: camera, lidar, scene_graph, cross_modal."""
        use_cam = bool(modality_config.use_cameras and images)
        use_lidar = bool(modality_config.use_lidar
                         and point_cloud is not None)
        use_ann = bool(modality_config.use_annotations and annotations)

        cam_out = lidar_out = sg_out = cm_out = None
        lidar_state = sg_state = None
        with self.timer.stage("layer1.batch1"):
            specs: List[dict] = []
            if use_cam:
                specs.append(self.camera_agent.prepare_call(images,
                                                            camera_names))
            if use_lidar:
                lidar_state = self.lidar_agent.front(point_cloud)
                specs.extend(lidar_state["calls"])
            if use_ann:
                sg_spec, sg_state = self.scene_graph_agent.prepare_call(
                    annotations)
                specs.append(sg_spec)
            # async dispatch: the camera pixel detector (pure host work)
            # runs WHILE the batched call decodes on device
            fut = (self.client.call_llm_batch_async(specs) if specs
                   else None)
            cam_dets = (self.camera_agent.detect(images, camera_names)
                        if use_cam else None)
            responses = fut.result() if fut is not None else []
            i = 0
            if use_cam:
                cam_out = self.camera_agent.finish(responses[i], images,
                                                   camera_names, cam_dets)
                i += 1
            if use_lidar:
                n = len(lidar_state["calls"])
                lidar_state = self.lidar_agent.after_classify(
                    lidar_state, responses[i: i + n])
                i += n
            if use_ann:
                sg_out = self.scene_graph_agent.finish(responses[i], sg_state)

        n_mod = use_cam + use_lidar + use_ann
        with self.timer.stage("layer1.batch2"):
            specs2: List[dict] = []
            if use_lidar:
                specs2.append(self.lidar_agent.interpret_call(lidar_state))
            if n_mod > 1:
                pre = [o for o in (
                    cam_out,
                    self.lidar_agent.report_stub(lidar_state)
                    if use_lidar else None,
                    sg_out) if o is not None]
                specs2.append(self.cross_modal_agent.prepare_call(pre))
            r2 = self.client.call_llm_batch(specs2) if specs2 else []
            j = 0
            if use_lidar:
                lidar_out = self.lidar_agent.finish(lidar_state, r2[j])
                j += 1
            if n_mod > 1:
                cm_out = self.cross_modal_agent.finish(r2[j])
                self._log("  CrossModalAgent coordinated information")

        return [o for o in (cam_out, lidar_out, sg_out, cm_out)
                if o is not None]

    def _layers_2_to_4(self, results: Dict[str, Any],
                       layer1_outputs: List[Dict]) -> Dict[str, Any]:
        # ---- Layer 2: seed caption ----
        self._log("Layer 2: Seed Features Generation...")
        transformed_content = {
            "observations": [out.get("observations", "")
                             for out in layer1_outputs]
        }
        with self.timer.stage("layer2.seed"):
            seed_caption = self.seed_agent.generate_comprehensive_caption(
                transformed_content)
        # the HOST carries the L1 marker lines into the merged caption
        # (utils/markers.py: the model merges prose; the pipeline is the
        # verbatim copier the reference expects GPT-4o to be)
        from msc_tpu.agents.seed import _format_observation
        from msc_tpu.utils.markers import carry_markers

        seed_caption["final_caption"] = carry_markers(
            seed_caption["final_caption"],
            [_format_observation(o) for o in transformed_content["observations"]])
        results["pipeline_stages"]["layer2_seed_caption"] = seed_caption

        # ---- Layer 3: iterative refinement ----
        self._log("Layer 3: Iterative Features Refinement...")
        with self.timer.stage("layer3.refinement"):
            refinement_result = self.refinement_system.refine(
                seed_caption["final_caption"], transformed_content)
        status = "converged" if refinement_result["converged"] else "completed"
        self._log(f"  Refinement {status} after "
                  f"{refinement_result['total_iterations']} iteration(s)")
        results["pipeline_stages"]["layer3_refinement"] = {
            "iterations": refinement_result["iterations"],
            "final_caption": refinement_result["final_caption"],
            "converged": refinement_result["converged"],
            "total_iterations": refinement_result["total_iterations"],
            "convergence_iteration": refinement_result.get("convergence_iteration"),
        }

        # ---- Layer 4: structured caption ----
        self._log("Layer 4: Caption Generation...")
        with self.timer.stage("layer4.caption"):
            structured = self.caption_generator.generate_structured_caption(
                refinement_result["final_caption"])
        results["pipeline_stages"]["layer4_caption"] = structured
        results["structured_caption"] = structured["structured_caption"]
        results["refinement_metadata"] = {
            "converged": refinement_result["converged"],
            "iterations": refinement_result["total_iterations"],
        }
        return results

    # ------------------------------------------------------------------
    def answer_mqa(self, question: str, scene_results: Dict) -> str:
        """Answer an MQA question about a processed scene
        (parity `src/pipeline.py:189-195`)."""
        with self.timer.stage("mqa.answer"):
            return self.caption_generator.answer_mqa_question(
                question, scene_results["structured_caption"])

    def answer_mqa_batch(self, questions: List[str],
                         scene_results: Dict) -> List[str]:
        """All of one scene's questions in a single batched model call
        (throughput lever, SURVEY.md section 7 step 7).  Uses the SAME
        canonical prompt as the serial path — batched/serial answers and
        the distillation training data must never drift apart."""
        from msc_tpu.agents.caption import (build_mqa_messages,
                                            mqa_response_format)

        caption = scene_results["structured_caption"]
        use_template = getattr(self.config, "mqa_template", False)
        # greedy: MQA answers are scored exact-match, and the answer is a
        # deterministic function of the caption facts — sampling noise
        # (temp 0.2 flipped measured answers batch-vs-serial) only costs
        calls = [dict(messages=build_mqa_messages(q, caption),
                      temperature=0.0, task="mqa_answer", max_new_tokens=64,
                      response_format=(mqa_response_format(q)
                                       if use_template else None))
                 for q in questions]
        with self.timer.stage("mqa.answer_batch"):
            return self.client.call_llm_batch(calls)
