from bist_tpu.tasks.tgifqa import (
    TGIFTask, TgifExample, load_tgif_tsv, init_tgif_model, tgif_forward,
    tgif_loss, make_tgif_train_step,
)
