from epa_ng_tpu.tree.tree import Tree, RtreeMapper, DEFAULT_BRANCH_LENGTH  # noqa: F401
