"""Experimental / off-path implementations (quarantined per VERDICT r3
Next #8).

Everything here is REAL, equality-tested code whose measured A/B on the
v5e LOST to the default path — kept as reproducible negative results (the
numbers live in PERF.md's "Honest negative results" table), not as
product surface:

  * bottleneck_train_kernel / bottleneck_grad — Pallas train-mode
    bottleneck forward/backward phase kernels + the custom_vjp plain-lax
    hand-fused backward (136 vs 131 ms fwd+bwd: XLA's global scheduling
    across the 60-bottleneck graph wins).
  * fused_train — the `model_backend='fused'` train-step backend wiring
    those kernels (equality-tested vs flax autodiff in
    tests/test_fused_train.py).
  * heatmap_kernel — Pallas Gaussian target rendering (12.0 vs 9.4 ms:
    XLA's closed-form batch render is already fused).
  * decode_kernel — Pallas argmax+offset decode (1.23 vs 0.90 ms).

The supported production dials remain in the main package:
models/fused_inference.py (inference kernels, the measured WIN) and
training/steps.py (flax autodiff default).
"""
