from baddiffusion_tpu.attack.loss import backdoor_loss, q_sample_backdoor

__all__ = ["backdoor_loss", "q_sample_backdoor"]
