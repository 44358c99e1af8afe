"""Train.ipynb equivalent: build datasets + 4-stack model, train with IoU
loss (the published best configuration), resume-able."""
import jax

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data.pipeline import DatasetBuilder
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib
from single_person_pose_estimation_tpu.training.trainer import Trainer

if __name__ == "__main__":
    cfg = Config().replace(hg_num_stacks=4)          # Train.ipynb cell 10
    model = StackedHourglass(num_stacks=4, num_channels=cfg.hg_num_channels)
    builder = DatasetBuilder(cfg)
    mesh = (mesh_lib.create_mesh((-1,), ("data",))
            if len(jax.devices()) > 1 else None)
    trainer = Trainer(model, builder, epochs=10, learning_rate=1e-3,
                      loss_str="iou", config=cfg, mesh=mesh)
    trainer.train()          # later sessions: trainer.resume_training()
    trainer.close()
