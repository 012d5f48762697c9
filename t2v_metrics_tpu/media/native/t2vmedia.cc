// t2vmedia — native host media decode for the TPU scoring pipeline.
//
// Replaces the per-sample PIL/decord/OpenCV decode of the reference
// (reference t2v_metrics: PIL in models/model.py:10-14, decord/cv2 in
// models/video_utils.py:31-73) with a batched C++ library:
//   * JPEG decode via libjpeg with a pthread worker pool — one call decodes
//     a whole scoring batch into a caller-provided contiguous buffer;
//   * MP4/AVI/MKV frame extraction via libavformat/libavcodec + swscale
//     RGB24 conversion (the ffmpeg stack the reference shells out to).
//
// C ABI only (extern "C"), bound from Python with ctypes
// (media/native_loader.py). Build: media/native/build.sh.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG buffer to RGB; returns 0 on success.
int decode_one_jpeg(const uint8_t* data, size_t len, uint8_t* out,
                    int* out_w, int* out_h, int max_w, int max_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  if (w > max_w || h > max_h) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *out_w = w;
  *out_h = h;
  const int stride = w * 3;
  std::vector<uint8_t*> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * stride;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* st = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->len) {
    png_error(png, "short read");
    return;
  }
  memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

// Decode one PNG buffer to RGB8 (palette/gray/alpha normalized); 0 on
// success.
int decode_one_png(const uint8_t* data, size_t len, uint8_t* out,
                   int* out_w, int* out_h, int max_w, int max_h) {
  if (len < 8 || png_sig_cmp(data, 0, 8) != 0) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);
  const int w = static_cast<int>(png_get_image_width(png, info));
  const int h = static_cast<int>(png_get_image_height(png, info));
  if (w > max_w || h > max_h) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  // normalize every color type to 8-bit RGB (PIL convert("RGB") parity:
  // alpha is stripped, not composited — PIL drops the alpha channel too)
  png_set_strip_16(png);
  png_set_packing(png);
  const int ct = png_get_color_type(png, info);
  if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ct == PNG_COLOR_TYPE_GRAY || ct == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  const int stride = w * 3;
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *out_w = w;
  *out_h = h;
  return 0;
}

}  // namespace

extern "C" {

// Decode `n` PNG buffers in parallel (same contract as
// t2v_decode_jpeg_batch). Returns number of failures.
int t2v_decode_png_batch(const uint8_t** datas, const size_t* lens, int n,
                         uint8_t* out, int* out_dims, int max_w, int max_h,
                         int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0), failures(0);
  const size_t slot = static_cast<size_t>(max_w) * max_h * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      const int rc =
          decode_one_png(datas[i], lens[i], out + slot * i, &w, &h,
                         max_w, max_h);
      if (rc != 0) {
        failures.fetch_add(1);
        out_dims[2 * i] = 0;
        out_dims[2 * i + 1] = 0;
      } else {
        out_dims[2 * i] = h;
        out_dims[2 * i + 1] = w;
      }
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min(num_threads, n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Decode `n` JPEG buffers in parallel.
//  datas/lens:  per-image encoded buffers
//  out:         n * max_h * max_w * 3 contiguous uint8 (row-major per slot)
//  out_dims:    n * 2 ints, (h, w) per image; (0, 0) marks a failure
// Returns number of failures.
int t2v_decode_jpeg_batch(const uint8_t** datas, const size_t* lens, int n,
                          uint8_t* out, int* out_dims, int max_w, int max_h,
                          int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0), failures(0);
  const size_t slot = static_cast<size_t>(max_w) * max_h * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      const int rc =
          decode_one_jpeg(datas[i], lens[i], out + slot * i, &w, &h,
                          max_w, max_h);
      if (rc != 0) {
        failures.fetch_add(1);
        out_dims[2 * i] = 0;
        out_dims[2 * i + 1] = 0;
      } else {
        out_dims[2 * i] = h;
        out_dims[2 * i + 1] = w;
      }
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min(num_threads, n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Probe a video: fills (total_frames_estimate, width, height, fps_num,
// fps_den). Returns 0 on success.
int t2v_video_info(const char* path, int64_t* info) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return 1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return 2;
  }
  const int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                     nullptr, 0);
  if (vs < 0) {
    avformat_close_input(&fmt);
    return 3;
  }
  AVStream* st = fmt->streams[vs];
  int64_t frames = st->nb_frames;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate
                                         : st->r_frame_rate;
  if (frames <= 0 && fmt->duration > 0 && fr.den > 0) {
    frames = static_cast<int64_t>(
        (fmt->duration / static_cast<double>(AV_TIME_BASE)) *
        fr.num / fr.den);
  }
  info[0] = frames;
  info[1] = st->codecpar->width;
  info[2] = st->codecpar->height;
  info[3] = fr.num;
  info[4] = fr.den ? fr.den : 1;
  avformat_close_input(&fmt);
  return 0;
}

// Decode the frames at the given (sorted ascending) frame indices as RGB24.
//  out: n_indices * height * width * 3 uint8
// Returns the number of frames actually written (sequential decode — no
// seeking, so accuracy is exact, unlike cv2's CAP_PROP_POS_FRAMES seeks).
int t2v_video_frames(const char* path, const int64_t* indices, int n_indices,
                     uint8_t* out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                     nullptr, 0);
  if (vs < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[vs];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, st->codecpar);
  ctx->thread_count = 0;  // auto
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }
  const int w = ctx->width, h = ctx->height;
  SwsContext* sws =
      sws_getContext(w, h, ctx->pix_fmt, w, h, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  const size_t slot = static_cast<size_t>(w) * h * 3;
  int64_t frame_idx = 0;
  int written = 0;

  auto handle_frame = [&](AVFrame* f) {
    while (written < n_indices && indices[written] == frame_idx) {
      uint8_t* dst[1] = {out + slot * written};
      int dst_stride[1] = {w * 3};
      sws_scale(sws, f->data, f->linesize, 0, h, dst, dst_stride);
      ++written;
    }
    ++frame_idx;
  };

  while (written < n_indices && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vs) {
      if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) handle_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // drain
  avcodec_send_packet(ctx, nullptr);
  while (written < n_indices && avcodec_receive_frame(ctx, frame) == 0) {
    handle_frame(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return written;
}

// ---------------------------------------------------------------------------
// Audio: probe + demux/decode (Qwen3-Omni use_audio_in_video — reference
// qwen3omni_model.py:140-148 probes with PyAV; decode replaces librosa).
// ---------------------------------------------------------------------------

// Does the container at `path` carry an audio stream? 1 yes, 0 no, <0 error.
int t2v_audio_probe(const char* path) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const int as = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                     nullptr, 0);
  avformat_close_input(&fmt);
  return as >= 0 ? 1 : 0;
}

// Decode the (best) audio stream of any container — video or audio file —
// to mono float32 at `rate` Hz. Writes up to max_samples into `out`.
// Returns the number of samples written, or <0 on error.
int64_t t2v_audio_decode(const char* path, int rate, float* out,
                         int64_t max_samples) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const int as = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                     nullptr, 0);
  if (as < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[as];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, st->codecpar);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (ctx->ch_layout.nb_channels > 0) {
    av_channel_layout_copy(&in_layout, &ctx->ch_layout);
  } else {
    av_channel_layout_default(&in_layout, 1);
  }
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, rate, &in_layout,
                          ctx->sample_fmt, ctx->sample_rate, 0,
                          nullptr) < 0 ||
      swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -5;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;

  auto drain_frame = [&](AVFrame* f) {
    if (written >= max_samples) return;
    uint8_t* dst[1] = {reinterpret_cast<uint8_t*>(out + written)};
    const int cap = static_cast<int>(max_samples - written);
    const int got = swr_convert(swr, dst, cap,
                                f ? const_cast<const uint8_t**>(f->data)
                                  : nullptr,
                                f ? f->nb_samples : 0);
    if (got > 0) written += got;
  };

  while (written < max_samples && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == as) {
      if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) drain_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(ctx, nullptr);
  while (written < max_samples && avcodec_receive_frame(ctx, frame) == 0) {
    drain_frame(frame);
  }
  drain_frame(nullptr);  // flush the resampler

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return written;
}

// Test-fixture writer: a small MKV with an mpeg4 video track (solid frames)
// and a pcm_s16le sine-tone audio track. Lets the test suite exercise the
// audio-in-video path without an ffmpeg binary in the image.
int t2v_test_write_av_seeded(const char* path, int w, int h, int n_frames,
                             int fps, int sr, int seed);

int t2v_test_write_av(const char* path, int w, int h, int n_frames, int fps,
                      int sr) {
  return t2v_test_write_av_seeded(path, w, h, n_frames, fps, sr, 0);
}

int t2v_test_write_av_seeded(const char* path, int w, int h, int n_frames,
                             int fps, int sr, int seed) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, "matroska", path) < 0)
    return -1;

  // --- video stream (mpeg4) ---
  const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!vcodec) return -2;
  AVStream* vst = avformat_new_stream(fmt, nullptr);
  AVCodecContext* vctx = avcodec_alloc_context3(vcodec);
  vctx->width = w;
  vctx->height = h;
  vctx->pix_fmt = AV_PIX_FMT_YUV420P;
  vctx->time_base = {1, fps};
  vctx->framerate = {fps, 1};
  vctx->bit_rate = 200000;
  vctx->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(vctx, vcodec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(vst->codecpar, vctx);
  vst->time_base = vctx->time_base;

  // --- audio stream (pcm_s16le) ---
  const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
  if (!acodec) return -4;
  AVStream* ast = avformat_new_stream(fmt, nullptr);
  AVCodecContext* actx = avcodec_alloc_context3(acodec);
  actx->sample_rate = sr;
  av_channel_layout_default(&actx->ch_layout, 1);
  actx->sample_fmt = AV_SAMPLE_FMT_S16;
  actx->time_base = {1, sr};
  if (avcodec_open2(actx, acodec, nullptr) < 0) return -5;
  avcodec_parameters_from_context(ast->codecpar, actx);
  ast->time_base = actx->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -6;
  }
  if (avformat_write_header(fmt, nullptr) < 0) return -7;

  AVPacket* pkt = av_packet_alloc();

  // video frames: moving gray ramp
  AVFrame* vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = w;
  vf->height = h;
  av_frame_get_buffer(vf, 0);
  for (int i = 0; i < n_frames; ++i) {
    av_frame_make_writable(vf);
    memset(vf->data[0], 60 + (seed * 29 + i * 13) % 160,
           static_cast<size_t>(vf->linesize[0]) * h);
    // per-seed luma texture so distinct "videos" have distinct pixels
    // (bench realism: identical device inputs would hit execution caches)
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; x += 3)
        vf->data[0][y * vf->linesize[0] + x] =
            static_cast<uint8_t>(60 + (seed * 31 + x * 7 + y * 3 + i * 13) % 160);
    memset(vf->data[1], 128, static_cast<size_t>(vf->linesize[1]) * h / 2);
    memset(vf->data[2], 128, static_cast<size_t>(vf->linesize[2]) * h / 2);
    vf->pts = i;
    if (avcodec_send_frame(vctx, vf) == 0) {
      while (avcodec_receive_packet(vctx, pkt) == 0) {
        av_packet_rescale_ts(pkt, vctx->time_base, vst->time_base);
        pkt->stream_index = vst->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
  }
  avcodec_send_frame(vctx, nullptr);
  while (avcodec_receive_packet(vctx, pkt) == 0) {
    av_packet_rescale_ts(pkt, vctx->time_base, vst->time_base);
    pkt->stream_index = vst->index;
    av_interleaved_write_frame(fmt, pkt);
  }

  // audio: 440 Hz sine for the full duration, 1024-sample chunks
  const int64_t total = static_cast<int64_t>(sr) * n_frames / fps;
  AVFrame* af = av_frame_alloc();
  int64_t t = 0;
  while (t < total) {
    const int n = static_cast<int>(std::min<int64_t>(1024, total - t));
    // av_frame_unref clears format fields — re-set them every chunk
    af->format = AV_SAMPLE_FMT_S16;
    av_channel_layout_default(&af->ch_layout, 1);
    af->sample_rate = sr;
    af->nb_samples = n;
    if (av_frame_get_buffer(af, 0) < 0) break;
    av_frame_make_writable(af);
    int16_t* smp = reinterpret_cast<int16_t*>(af->data[0]);
    for (int i = 0; i < n; ++i) {
      smp[i] = static_cast<int16_t>(
          12000.0 * sin(2.0 * 3.14159265358979 * 440.0 * (t + i) / sr));
    }
    af->pts = t;
    t += n;
    if (avcodec_send_frame(actx, af) == 0) {
      while (avcodec_receive_packet(actx, pkt) == 0) {
        av_packet_rescale_ts(pkt, actx->time_base, ast->time_base);
        pkt->stream_index = ast->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
    av_frame_unref(af);
  }
  avcodec_send_frame(actx, nullptr);
  while (avcodec_receive_packet(actx, pkt) == 0) {
    av_packet_rescale_ts(pkt, actx->time_base, ast->time_base);
    pkt->stream_index = ast->index;
    av_interleaved_write_frame(fmt, pkt);
  }

  av_write_trailer(fmt);
  av_frame_free(&vf);
  av_frame_free(&af);
  av_packet_free(&pkt);
  avcodec_free_context(&vctx);
  avcodec_free_context(&actx);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PIL-exact bicubic resize (CLIP preprocessing hot path)
// ---------------------------------------------------------------------------
//
// The reference preprocesses every image with PIL/CLIPImageProcessor
// bicubic resampling on the Python side (reference mm_utils.py expand2square
// + HF image processors). Score parity therefore requires PIL's exact
// fixed-point resampling semantics: separable horizontal-then-vertical
// passes, per-pass uint8 re-quantization, coefficient normalization and
// rounding at 22-bit precision, and the a=-0.5 cubic kernel. This is a
// fresh implementation of those published semantics for RGB24 batches —
// on a 1-core pipeline host it replaces ~11 ms/image of PIL Python-path
// resize with ~3 ms/image of C++, taking host preprocessing off the
// pipelined batch_forward critical path.

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;

double bicubic_filter(double x) {
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Coefficient table for one axis: per output index, the first source tap
// (bounds[2i]) and tap count (bounds[2i+1]), plus ksize fixed-point
// weights rounded half-away-from-zero at kPrecisionBits.
int precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                      std::vector<int>* kk) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->assign(out_size * 2, 0);
  kk->assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> prek(ksize);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double w = bicubic_filter((x + xmin - center + 0.5) * ss);
      prek[x] = w;
      ww += w;
    }
    int* k = kk->data() + static_cast<size_t>(xx) * ksize;
    for (int x = 0; x < xmax; ++x) {
      const double w = ww != 0.0 ? prek[x] / ww : prek[x];
      k[x] = static_cast<int>(w < 0 ? w * (1 << kPrecisionBits) - 0.5
                                    : w * (1 << kPrecisionBits) + 0.5);
    }
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  return ksize;
}

inline uint8_t clip8(int v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

void resample_horizontal(const uint8_t* in, int h, int w, uint8_t* out,
                         int out_w, const std::vector<int>& bounds,
                         const std::vector<int>& kk, int ksize) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * w * 3;
    uint8_t* orow = out + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = bounds[xx * 2];
      const int xmax = bounds[xx * 2 + 1];
      const int* k = kk.data() + static_cast<size_t>(xx) * ksize;
      int s0 = 1 << (kPrecisionBits - 1);
      int s1 = s0, s2 = s0;
      const uint8_t* p = row + static_cast<size_t>(xmin) * 3;
      for (int x = 0; x < xmax; ++x, p += 3) {
        s0 += p[0] * k[x];
        s1 += p[1] * k[x];
        s2 += p[2] * k[x];
      }
      orow[xx * 3 + 0] = clip8(s0);
      orow[xx * 3 + 1] = clip8(s1);
      orow[xx * 3 + 2] = clip8(s2);
    }
  }
}

void resample_vertical(const uint8_t* in, int h, int w, uint8_t* out,
                       int out_h, const std::vector<int>& bounds,
                       const std::vector<int>& kk, int ksize,
                       std::vector<int>* acc) {
  const int rowlen = w * 3;
  acc->resize(rowlen);
  for (int yy = 0; yy < out_h; ++yy) {
    const int ymin = bounds[yy * 2];
    const int ymax = bounds[yy * 2 + 1];
    const int* k = kk.data() + static_cast<size_t>(yy) * ksize;
    std::fill(acc->begin(), acc->end(), 1 << (kPrecisionBits - 1));
    int* a = acc->data();
    for (int y = 0; y < ymax; ++y) {
      const uint8_t* row = in + static_cast<size_t>(y + ymin) * rowlen;
      const int ky = k[y];
      for (int x = 0; x < rowlen; ++x) a[x] += row[x] * ky;
    }
    uint8_t* orow = out + static_cast<size_t>(yy) * rowlen;
    for (int x = 0; x < rowlen; ++x) orow[x] = clip8(a[x]);
  }
}

struct ResampleScratch {
  std::vector<int> hb, hk, vb, vk, acc;
  std::vector<uint8_t> mid, square;
};

// (h, w) -> (out_h, out_w), PIL Image.resize(..., BICUBIC) semantics.
void resample_image(const uint8_t* in, int h, int w, uint8_t* out, int out_h,
                    int out_w, ResampleScratch* s) {
  const int hks = precompute_coeffs(w, out_w, &s->hb, &s->hk);
  const int vks = precompute_coeffs(h, out_h, &s->vb, &s->vk);
  s->mid.resize(static_cast<size_t>(h) * out_w * 3);
  resample_horizontal(in, h, w, s->mid.data(), out_w, s->hb, s->hk, hks);
  resample_vertical(s->mid.data(), h, out_w, out, out_h, s->vb, s->vk, vks,
                    &s->acc);
}

}  // namespace

extern "C" {

// Batched CLIP preprocessing resize. mode 0: expand2square with fill then
// resize to (size, size) (LLaVA "pad"). mode 1: resize shortest side to
// `size` then center crop (torchvision Resize+CenterCrop). imgs[i] is an
// (dims[2i], dims[2i+1], 3) uint8 RGB array; out is n*size*size*3.
// Returns 0 on success.
int t2v_clip_resize_batch(const uint8_t** imgs, const int* dims, int n,
                          int size, int mode, uint8_t fill_r, uint8_t fill_g,
                          uint8_t fill_b, uint8_t* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0), failures(0);
  const size_t slot = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    ResampleScratch s;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int h = dims[2 * i], w = dims[2 * i + 1];
      if (h <= 0 || w <= 0) {
        failures.fetch_add(1);
        continue;
      }
      const uint8_t* src = imgs[i];
      int sh = h, sw = w;
      if (mode == 0 && h != w) {
        // expand2square: centered paste on a fill-colored square
        // (reference mm_utils.py:128-139)
        const int side = h > w ? h : w;
        s.square.resize(static_cast<size_t>(side) * side * 3);
        uint8_t* sq = s.square.data();
        for (size_t px = 0; px < static_cast<size_t>(side) * side; ++px) {
          sq[px * 3 + 0] = fill_r;
          sq[px * 3 + 1] = fill_g;
          sq[px * 3 + 2] = fill_b;
        }
        if (w > h) {
          const int top = (side - h) / 2;
          memcpy(sq + static_cast<size_t>(top) * side * 3, src,
                 static_cast<size_t>(h) * w * 3);
        } else {
          const int left = (side - w) / 2;
          for (int y = 0; y < h; ++y)
            memcpy(sq + (static_cast<size_t>(y) * side + left) * 3,
                   src + static_cast<size_t>(y) * w * 3,
                   static_cast<size_t>(w) * 3);
        }
        src = sq;
        sh = sw = side;
      }
      if (mode == 1) {
        // shortest-side target dims, round-half-even like Python round()
        int rh, rw;
        if (sh <= sw) {
          rh = size;
          rw = static_cast<int>(std::nearbyint(
              static_cast<double>(sw) * size / sh));
          if (rw < 1) rw = 1;
        } else {
          rw = size;
          rh = static_cast<int>(std::nearbyint(
              static_cast<double>(sh) * size / sw));
          if (rh < 1) rh = 1;
        }
        std::vector<uint8_t> full(static_cast<size_t>(rh) * rw * 3);
        resample_image(src, sh, sw, full.data(), rh, rw, &s);
        const int top = (rh - size) / 2, left = (rw - size) / 2;
        uint8_t* dst = out + slot * i;
        for (int y = 0; y < size; ++y)
          memcpy(dst + static_cast<size_t>(y) * size * 3,
                 full.data() + (static_cast<size_t>(y + top) * rw + left) * 3,
                 static_cast<size_t>(size) * 3);
      } else {
        resample_image(src, sh, sw, out + slot * i, size, size, &s);
      }
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min(num_threads, n > 0 ? n : 1);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
