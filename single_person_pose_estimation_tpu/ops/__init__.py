from single_person_pose_estimation_tpu.ops import augment, decode, geometry, heatmap
