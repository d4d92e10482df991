// Third-party conformance oracle: decode/encode AAC via the system
// libavcodec (FFmpeg), used by tests/test_ffmpeg_oracle.py to validate
// aacjax end-to-end against an independent industry decoder — something
// the reference project never had (it shipped no tests, SURVEY.md §4).
//
// Test-only component; the aacjax decode path never touches FFmpeg.
//
// Build: make -C native oracle  ->  native/libfforacle.so

#include <libavcodec/avcodec.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <stdint.h>
#include <string.h>

// Decode an ADTS byte stream. Returns total samples per channel written
// (interleaved float32 into out), or negative on error.
// channels/sample_rate are outputs.
int64_t ffdec_decode_adts(const uint8_t* data, int64_t len, float* out,
                          int64_t out_cap_samples, int* channels,
                          int* sample_rate) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

  AVCodecParserContext* parser = av_parser_init(AV_CODEC_ID_AAC);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int nch = 0, rate = 0;
  int err = 0;

  const uint8_t* p = data;
  int64_t remaining = len;
  while (remaining > 0) {
    uint8_t* opkt = NULL;
    int opkt_size = 0;
    int used = av_parser_parse2(parser, ctx, &opkt, &opkt_size,
                                p, (int)remaining, AV_NOPTS_VALUE,
                                AV_NOPTS_VALUE, 0);
    if (used < 0) { err = -4; break; }
    p += used;
    remaining -= used;
    if (opkt_size == 0) {
      if (remaining <= 0) break;
      continue;
    }
    pkt->data = opkt;
    pkt->size = opkt_size;
    if (avcodec_send_packet(ctx, pkt) < 0) { err = -5; break; }
    while (1) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { err = -6; goto done; }
      nch = ctx->ch_layout.nb_channels;
      rate = ctx->sample_rate;
      int ns = frame->nb_samples;
      if ((written + ns) * nch > out_cap_samples) { err = -7; goto done; }
      // fltp planes -> interleaved
      for (int s = 0; s < ns; ++s)
        for (int c = 0; c < nch; ++c)
          out[(written + s) * nch + c] =
              ((const float*)frame->extended_data[c])[s];
      written += ns;
    }
  }
  // flush
  avcodec_send_packet(ctx, NULL);
  while (1) {
    int r = avcodec_receive_frame(ctx, frame);
    if (r < 0) break;
    nch = ctx->ch_layout.nb_channels;
    rate = ctx->sample_rate;
    int ns = frame->nb_samples;
    if ((written + ns) * nch > out_cap_samples) { err = -7; break; }
    for (int s = 0; s < ns; ++s)
      for (int c = 0; c < nch; ++c)
        out[(written + s) * nch + c] = ((const float*)frame->extended_data[c])[s];
    written += ns;
  }
done:
  av_frame_free(&frame);
  av_packet_free(&pkt);
  av_parser_close(parser);
  avcodec_free_context(&ctx);
  if (err) return err;
  *channels = nch;
  *sample_rate = rate;
  return written;
}


// Decode raw AAC packets (raw_data_blocks) with an explicit
// AudioSpecificConfig as extradata — needed for modes ADTS cannot signal
// (frameLengthFlag / 960-sample frames, explicit SBR signaling).
// Returns total samples per channel written, or negative on error.
int64_t ffdec_decode_raw(const uint8_t* asc, int asc_len,
                         const uint8_t* blob, const int64_t* offsets,
                         int64_t n_frames, float* out,
                         int64_t out_cap_samples, int* channels,
                         int* sample_rate) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  ctx->extradata = av_mallocz(asc_len + AV_INPUT_BUFFER_PADDING_SIZE);
  if (!ctx->extradata) { avcodec_free_context(&ctx); return -2; }
  memcpy(ctx->extradata, asc, asc_len);
  ctx->extradata_size = asc_len;
  if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int nch = 0, rate = 0;
  int err = 0;
  for (int64_t i = 0; i <= n_frames; ++i) {
    if (i < n_frames) {
      pkt->data = (uint8_t*)(blob + offsets[i]);
      pkt->size = (int)(offsets[i + 1] - offsets[i]);
      if (avcodec_send_packet(ctx, pkt) < 0) { err = -5; break; }
    } else {
      avcodec_send_packet(ctx, NULL);  // flush
    }
    while (1) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { err = -6; goto done; }
      nch = ctx->ch_layout.nb_channels;
      rate = ctx->sample_rate;
      int ns = frame->nb_samples;
      if ((written + ns) * nch > out_cap_samples) { err = -7; goto done; }
      for (int s = 0; s < ns; ++s)
        for (int c = 0; c < nch; ++c)
          out[(written + s) * nch + c] = ((const float*)frame->extended_data[c])[s];
      written += ns;
    }
  }
done:
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  if (err) return err;
  *channels = nch;
  *sample_rate = rate;
  return written;
}

// Encode interleaved float PCM (-1..1 scale) with FFmpeg's native AAC
// encoder.  Emits raw AAC packets back-to-back into `out` and packet
// sizes into `pkt_sizes` (caller wraps them in ADTS headers).
// Returns the packet count, or negative on error.
int64_t ffenc_encode_aac(const float* pcm, int64_t n_samples, int channels,
                         int sample_rate, int64_t bit_rate,
                         const char* opts,
                         uint8_t* out, int64_t out_cap,
                         int32_t* pkt_sizes, int64_t max_pkts) {
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  ctx->sample_rate = sample_rate;
  av_channel_layout_default(&ctx->ch_layout, channels);
  ctx->bit_rate = bit_rate;
  ctx->profile = FF_PROFILE_AAC_LOW;
  // encoder-tool options, e.g. "aac_pns=0:aac_tns=1" (PNS noise is
  // decoder-specific by design, so conformance tests turn it off)
  if (opts && *opts) av_set_options_string(ctx->priv_data, opts, "=", ":");
  if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  frame->format = AV_SAMPLE_FMT_FLTP;
  frame->nb_samples = ctx->frame_size;
  av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
  if (av_frame_get_buffer(frame, 0) < 0) return -4;

  int64_t pos = 0, npkts = 0, outpos = 0;
  int err = 0;
  while (pos < n_samples) {
    int ns = (int)((n_samples - pos) < ctx->frame_size
                       ? (n_samples - pos) : ctx->frame_size);
    av_frame_make_writable(frame);
    frame->nb_samples = ns;
    for (int c = 0; c < channels; ++c) {
      float* plane = (float*)frame->extended_data[c];
      for (int s = 0; s < ns; ++s) plane[s] = pcm[(pos + s) * channels + c];
    }
    pos += ns;
    if (avcodec_send_frame(ctx, frame) < 0) { err = -5; break; }
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      if (npkts >= max_pkts || outpos + pkt->size > out_cap) { err = -6; break; }
      memcpy(out + outpos, pkt->data, pkt->size);
      outpos += pkt->size;
      pkt_sizes[npkts++] = pkt->size;
      av_packet_unref(pkt);
    }
    if (err) break;
  }
  if (!err) {
    avcodec_send_frame(ctx, NULL);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      if (npkts >= max_pkts || outpos + pkt->size > out_cap) { err = -6; break; }
      memcpy(out + outpos, pkt->data, pkt->size);
      outpos += pkt->size;
      pkt_sizes[npkts++] = pkt->size;
      av_packet_unref(pkt);
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  return err ? err : npkts;
}


// Decode a LOAS/LATM byte stream (AudioSyncStream framing, LATM mux) —
// arbitrates aacjax's LATM demuxer (aacjax/host/latm.py).
int64_t ffdec_decode_loas(const uint8_t* data, int64_t len, float* out,
                          int64_t out_cap_samples, int* channels,
                          int* sample_rate) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_AAC_LATM);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

  AVCodecParserContext* parser = av_parser_init(AV_CODEC_ID_AAC_LATM);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int nch = 0, rate = 0;
  int err = 0;

  const uint8_t* p = data;
  int64_t remaining = len;
  while (remaining > 0) {
    uint8_t* opkt = NULL;
    int opkt_size = 0;
    int used = av_parser_parse2(parser, ctx, &opkt, &opkt_size,
                                p, (int)remaining, AV_NOPTS_VALUE,
                                AV_NOPTS_VALUE, 0);
    if (used < 0) { err = -4; break; }
    p += used;
    remaining -= used;
    if (opkt_size == 0) {
      if (remaining <= 0) break;
      continue;
    }
    pkt->data = opkt;
    pkt->size = opkt_size;
    if (avcodec_send_packet(ctx, pkt) < 0) { err = -5; break; }
    while (1) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { err = -6; goto done; }
      nch = ctx->ch_layout.nb_channels;
      rate = ctx->sample_rate;
      int ns = frame->nb_samples;
      if ((written + ns) * nch > out_cap_samples) { err = -7; goto done; }
      for (int s = 0; s < ns; ++s)
        for (int c = 0; c < nch; ++c)
          out[(written + s) * nch + c] =
              ((const float*)frame->extended_data[c])[s];
      written += ns;
    }
  }
  avcodec_send_packet(ctx, NULL);
  while (1) {
    int r = avcodec_receive_frame(ctx, frame);
    if (r < 0) break;
    nch = ctx->ch_layout.nb_channels;
    rate = ctx->sample_rate;
    int ns = frame->nb_samples;
    if ((written + ns) * nch > out_cap_samples) { err = -7; break; }
    for (int s = 0; s < ns; ++s)
      for (int c = 0; c < nch; ++c)
        out[(written + s) * nch + c] = ((const float*)frame->extended_data[c])[s];
    written += ns;
  }
done:
  av_frame_free(&frame);
  av_packet_free(&pkt);
  av_parser_close(parser);
  avcodec_free_context(&ctx);
  if (err) return err;
  *channels = nch;
  *sample_rate = rate;
  return written;
}
