from gphocs_tpu.model.poptree import PopTree, build_poptree  # noqa: F401
