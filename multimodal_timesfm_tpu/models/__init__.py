"""Model layer (L2): TSFM backbones, fusion, decoder, text encoders.

All models are pure functions over parameter pytrees:
``init(rng, cfg) -> params`` and ``apply(params, ...) -> outputs``. There is
no module state; freezing a subtree is ``stop_gradient`` / optimizer
partitioning, not ``requires_grad`` flags.
"""
