# Runtime defaults (parity: reference configs/_base_/default_runtime.py).
checkpoint_config = dict(interval=1)
log_config = dict(interval=50,
                  hooks=[dict(type='TextLoggerHook'),
                         dict(type='TensorboardLoggerHook')])
# the TPU-native backend: SPMD over a jax device mesh (ICI collectives);
# kept for config-surface compatibility with the reference's dist_params.
dist_params = dict(backend='xla')
log_level = 'INFO'
work_dir = None
load_from = None
resume_from = None
workflow = [('train', 1)]
