from .losses import multiscale_spectral_loss, waveform_l2, stft_mag
from .train import SoundMatcher, batched_train_step

__all__ = ["multiscale_spectral_loss", "waveform_l2", "stft_mag",
           "SoundMatcher", "batched_train_step"]
