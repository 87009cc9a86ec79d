"""Streamlit demo on the JAX inference path (capability-equivalent to
reference: whisper_finetune/streamlit_app.py — upload, transcription
blockquote, per-segment emotion bar charts). Requires streamlit; in
streamlit-less environments use serve/http_server.py instead.

  streamlit run audio_transformers_tpu/serve/app.py -- \
      --model_path ./emotion_whisper_model/checkpoints
"""

from __future__ import annotations

import sys
import tempfile


def main():
    import streamlit as st

    st.set_page_config(page_title="Audio Emotion Recognition", page_icon="*")
    st.title("Audio Emotion Recognition & Transcription")
    st.markdown("Upload an audio file; the model transcribes it and "
                "estimates emotions for 5-second segments.")

    @st.cache_resource
    def load(model_path, tokenizer):
        import argparse

        from audio_transformers_tpu.cli.infer import load_pipeline
        ns = argparse.Namespace(model_path=model_path, tokenizer=tokenizer)
        return load_pipeline(ns)

    args = dict(a.split("=", 1) for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    pipeline = load(args.get("--model_path"), args.get("--tokenizer"))

    uploaded = st.file_uploader("Audio file",
                                type=["wav", "mp3", "flac", "ogg", "m4a"])
    if uploaded is None:
        return
    st.audio(uploaded)
    if not st.button("Analyze"):
        return

    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        tmp.write(uploaded.getvalue())
        tmp.flush()
        from audio_transformers_tpu.utils.audio import read_wav
        wav, sr = read_wav(tmp.name)

    with st.spinner("Processing audio..."):
        result = pipeline.analyze(wav, sr, segment_duration=5.0)

    st.subheader("Transcription")
    st.markdown(f"> {result['transcription']}")
    st.subheader("Emotion analysis by segment")
    for seg in result["segments"]:
        st.markdown(f"**{seg['start']:.1f}s – {seg['end']:.1f}s** — "
                    f"{seg['emotion']}")
        st.bar_chart(seg["emotion_probs"])


if __name__ == "__main__":
    main()
