from bvc_tpu.data.indexing import (  # noqa: F401
    get_group,
    get_fpathlist,
    get_fold,
    get_train_val_split,
    get_fpathseqlist,
    get_fpath2framelist,
    AGE_GROUPS,
)
