"""Reference-compatible CLI surface.

Thin argparse shims preserving the public contract of the reference
(``python -m src.<module>`` with the flags of docs/cli_reference.md and the
``outputs/`` artifact layout), delegating all work to the ``ssip_tpu``
framework. Workflow: data_audit → feature_extraction → standardize_features
→ clustering → export_unlabeled_cohort → supervised/semi_supervised_training
→ threshold_sweep.
"""
