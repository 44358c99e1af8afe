"""save_model.ipynb equivalent: best checkpoint -> deployable artifacts
(JAX-native Orbax bundle + optional TF SavedModel via jax2tf + optional
TFLite flatbuffer for edge targets)."""
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.utils.export import (
    export_savedmodel,
    export_tflite,
    save_inference_artifact,
)
from single_person_pose_estimation_tpu.utils.model_utils import (
    load_model_from_checkpoint,
)

if __name__ == "__main__":
    cfg = Config().replace(hg_num_stacks=4)
    model = StackedHourglass(num_stacks=4, num_channels=cfg.hg_num_channels)
    state, _ = load_model_from_checkpoint(model, cfg.checkpoints_path,
                                          best=True)
    save_inference_artifact(cfg, state.params, state.batch_stats,
                            "exported/hourglass_s4")
    try:
        export_savedmodel(cfg, state.params, state.batch_stats,
                          "exported/hourglass_s4_savedmodel")
        size = export_tflite(cfg, state.params, state.batch_stats,
                             "exported/hourglass_s4_dynamic.tflite",
                             quantize="dynamic")
        print(f"TFLite (dynamic-range int8 weights): {size} bytes")
    except RuntimeError as e:
        print(f"TF-dependent exports skipped: {e}")
