"""Hand-written Pallas TPU kernels on the PRODUCTION inference path
(bottleneck/uplevel/head/mobile/bottom/warp — the measured wins wired
through models/fused_inference.py and ops/augment.py).

Measured-slower alternatives (train-mode bottleneck kernels, heatmap
render, decode) are quarantined in
single_person_pose_estimation_tpu.experimental (VERDICT r3 Next #8);
their A/B numbers live in PERF.md's negative-results table.
"""
