from .losses import multiscale_spectral_loss, waveform_l2, stft_mag
from .train import SoundMatcher, batched_train_step
from .pitch import hz_to_cv, cv_to_hz, midi_to_cv, note_to_cv
from .notes import note_track, note_tracks, allocate_voices
from .profiling import RenderStats, timed_render, trace
from .debug import check_finite, quarantine_batch, recompile_guard

__all__ = ["multiscale_spectral_loss", "waveform_l2", "stft_mag",
           "SoundMatcher", "batched_train_step",
           "hz_to_cv", "cv_to_hz", "midi_to_cv", "note_to_cv",
           "note_track", "note_tracks", "allocate_voices",
           "RenderStats", "timed_render", "trace",
           "check_finite", "quarantine_batch", "recompile_guard"]
