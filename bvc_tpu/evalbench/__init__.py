from bvc_tpu.evalbench.scores import get_nn_score, get_separability_score  # noqa: F401
