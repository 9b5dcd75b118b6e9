from .train_step import make_train_step, next_token_loss
