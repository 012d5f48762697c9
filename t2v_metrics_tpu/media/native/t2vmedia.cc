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
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
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

}  // namespace

extern "C" {

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

}  // extern "C"
