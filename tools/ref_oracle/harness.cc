// Test-oracle harness around the reference guetzli implementation
// (/root/reference, mounted read-only). This is NOT part of the framework;
// it only exists so tests can dump golden vectors and golden encodes.
//
// Usage:
//   oracle encode_rgb <w> <h> <rgb.raw> <quality> <out.jpg>   # raw interleaved RGB8
//   oracle encode_jpg <in.jpg> <quality> <out.jpg>
//   oracle ba <w> <h> <rgb0.raw> <rgb1.raw>                   # butteraugli distance
//   oracle diffmap <w> <h> <rgb0.raw> <rgb1.raw> <out.f32>    # full diffmap dump
//   oracle fdct <in.i16x64> <n> <out.i16x64>                  # reference integer FDCT per block
//   oracle idct <in.i16x64> <n> <out.u8x64>                   # reference integer IDCT per block
//   oracle decode_jpg <in.jpg> <out_meta.txt> <out_coeffs.i16> # parse to coefficients
//   oracle decode_rgb <in.jpg> <out.raw>                      # full decode to RGB8
//   oracle opsin <w> <h> <rgb.raw> <out.f32>                  # OpsinDynamicsImage planes
//   oracle blur <w> <h> <plane.f32> <sigma> <border> <out.f32>
//   oracle mask <w> <h> <rgb0.raw> <rgb1.raw> <out.f32>       # mask xyb planes (3+3)
#include <algorithm>
#include <utility>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "guetzli/processor.h"
#include "guetzli/jpeg_data.h"
#include "guetzli/jpeg_data_reader.h"
#include "guetzli/jpeg_data_decoder.h"
#include "guetzli/jpeg_data_writer.h"
#include "guetzli/jpeg_data_encoder.h"
#include "guetzli/output_image.h"
#include "guetzli/butteraugli_comparator.h"
#include "guetzli/quality.h"
#include "guetzli/stats.h"
#include "guetzli/fdct.h"
#include "guetzli/idct.h"
#include "guetzli/gamma_correct.h"
#include "butteraugli/butteraugli.h"

static std::string ReadFile(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string s(n, 0);
  if (fread(&s[0], 1, n, f) != (size_t)n) { exit(2); }
  fclose(f);
  return s;
}

static void WriteFile(const char* path, const void* data, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(2); }
  fwrite(data, 1, n, f);
  fclose(f);
}

static std::vector<butteraugli::ImageF> PlanesFromRGB(
    const std::vector<uint8_t>& rgb, size_t w, size_t h) {
  // linear RGB planes from interleaved sRGB8 (same as guetzli's
  // butteraugli_comparator ctor path).
  const double* lut = guetzli::Srgb8ToLinearTable();
  std::vector<butteraugli::ImageF> img;
  for (int c = 0; c < 3; ++c) {
    img.push_back(butteraugli::ImageF(w, h));
    for (size_t y = 0; y < h; ++y) {
      float* row = img[c].Row(y);
      for (size_t x = 0; x < w; ++x) row[x] = lut[rgb[3 * (y * w + x) + c]];
    }
  }
  return img;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "need mode\n"); return 2; }
  std::string mode = argv[1];
  if (mode == "encode_rgb" || mode == "encode_jpg") {
    guetzli::Params params;
    guetzli::ProcessStats stats;
    if (getenv("ORACLE_VERBOSE")) stats.debug_output_file = stderr;
    // 4:2:0 parity probes (guetzli/processor.h:29-37 knobs, not
    // CLI-exposed in the reference either)
    if (getenv("ORACLE_FORCE_420")) params.force_420 = true;
    if (getenv("ORACLE_TRY_420")) params.try_420 = true;
    std::string out;
    bool ok;
    if (mode == "encode_rgb") {
      int w = atoi(argv[2]), h = atoi(argv[3]);
      std::string raw = ReadFile(argv[4]);
      params.butteraugli_target = guetzli::ButteraugliScoreForQuality(atof(argv[5]));
      std::vector<uint8_t> rgb(raw.begin(), raw.end());
      ok = guetzli::Process(params, &stats, rgb, w, h, &out);
      if (ok) WriteFile(argv[6], out.data(), out.size());
    } else {
      std::string in = ReadFile(argv[2]);
      params.butteraugli_target = guetzli::ButteraugliScoreForQuality(atof(argv[3]));
      ok = guetzli::Process(params, &stats, in, &out);
      if (ok) WriteFile(argv[4], out.data(), out.size());
    }
    printf("ok=%d size=%zu\n", (int)ok, out.size());
    return ok ? 0 : 1;
  }
  if (mode == "ba" || mode == "diffmap") {
    size_t w = atoi(argv[2]), h = atoi(argv[3]);
    std::string r0 = ReadFile(argv[4]), r1 = ReadFile(argv[5]);
    std::vector<uint8_t> v0(r0.begin(), r0.end()), v1(r1.begin(), r1.end());
    auto p0 = PlanesFromRGB(v0, w, h);
    auto p1 = PlanesFromRGB(v1, w, h);
    butteraugli::ImageF diffmap;
    double diff = 0;
    butteraugli::ButteraugliDiffmap(p0, p1, diffmap);
    diff = butteraugli::ButteraugliScoreFromDiffmap(diffmap);
    printf("distance=%.10f\n", diff);
    if (mode == "diffmap") {
      std::vector<float> buf(w * h);
      for (size_t y = 0; y < h; ++y)
        memcpy(&buf[y * w], diffmap.Row(y), w * sizeof(float));
      WriteFile(argv[6], buf.data(), buf.size() * sizeof(float));
    }
    return 0;
  }
  if (mode == "heatmap") {
    // heatmap <w> <h> <f32 distmap file> <out raw rgb> — the reference
    // fuzzy-class heatmap mapping applied to a given distmap.
    size_t w = atoi(argv[2]), h = atoi(argv[3]);
    std::string raw = ReadFile(argv[4]);
    std::vector<float> dm(w * h);
    memcpy(dm.data(), raw.data(), w * h * sizeof(float));
    const double good = butteraugli::ButteraugliFuzzyInverse(1.5);
    const double bad = butteraugli::ButteraugliFuzzyInverse(0.5);
    std::vector<uint8_t> rgb;
    butteraugli::CreateHeatMapImage(dm, good, bad, w, h, &rgb);
    WriteFile(argv[5], rgb.data(), rgb.size());
    printf("good=%.10f bad=%.10f\n", good, bad);
    return 0;
  }
  if (mode == "fdct") {
    std::string in = ReadFile(argv[2]);
    int n = atoi(argv[3]);
    std::vector<guetzli::coeff_t> out(n * 64);
    memcpy(out.data(), in.data(), n * 64 * sizeof(guetzli::coeff_t));
    for (int i = 0; i < n; ++i) {
      guetzli::ComputeBlockDCT(&out[i * 64]);  // in-place (fdct.h:27)
    }
    WriteFile(argv[4], out.data(), out.size() * sizeof(guetzli::coeff_t));
    return 0;
  }
  if (mode == "idct") {
    std::string in = ReadFile(argv[2]);
    int n = atoi(argv[3]);
    std::vector<uint8_t> out(n * 64);
    for (int i = 0; i < n; ++i) {
      guetzli::ComputeBlockIDCT(
          (const guetzli::coeff_t*)in.data() + i * 64, &out[i * 64]);
    }
    WriteFile(argv[4], out.data(), out.size());
    return 0;
  }
  if (mode == "decode_jpg") {
    std::string in = ReadFile(argv[2]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) {
      fprintf(stderr, "parse error %d\n", jpg.error);
      return 1;
    }
    FILE* meta = fopen(argv[3], "w");
    fprintf(meta, "width=%d height=%d ncomp=%zu restart=%d\n", jpg.width,
            jpg.height, jpg.components.size(), jpg.restart_interval);
    for (size_t i = 0; i < jpg.components.size(); ++i) {
      const auto& c = jpg.components[i];
      fprintf(meta, "comp id=%d h=%d v=%d wib=%d hib=%d quant=%d ncoeff=%zu\n",
              c.id, c.h_samp_factor, c.v_samp_factor, c.width_in_blocks,
              c.height_in_blocks, c.quant_idx, c.coeffs.size());
    }
    for (size_t i = 0; i < jpg.quant.size(); ++i) {
      fprintf(meta, "quant idx=%zu:", i);
      for (int k = 0; k < 64; ++k) fprintf(meta, " %d", jpg.quant[i].values[k]);
      fprintf(meta, "\n");
    }
    fclose(meta);
    FILE* cf = fopen(argv[4], "wb");
    for (const auto& c : jpg.components)
      fwrite(c.coeffs.data(), sizeof(guetzli::coeff_t), c.coeffs.size(), cf);
    fclose(cf);
    return 0;
  }
  if (mode == "reencode") {
    // reencode <in.jpg> <strip01> <out.jpg>: parse + WriteJpeg (the
    // reference serializer with optimal Huffman), for writer byte-parity.
    std::string in = ReadFile(argv[2]);
    int strip = atoi(argv[3]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    std::string out;
    auto append = [](void* data, const uint8_t* buf, size_t count) -> int {
      ((std::string*)data)->append((const char*)buf, count);
      return (int)count;
    };
    guetzli::JPEGOutput writer(append, &out);
    if (!guetzli::WriteJpeg(jpg, strip != 0, writer)) return 1;
    WriteFile(argv[4], out.data(), out.size());
    printf("size=%zu\n", out.size());
    return 0;
  }
  if (mode == "encode_rgb_coeffs") {
    // encode_rgb_coeffs <w> <h> <rgb.raw> <out.i16>: the RGB->JPEG
    // bootstrap (YUV16 + FDCT + quant=1), dumping raw coefficients.
    int w = atoi(argv[2]), h = atoi(argv[3]);
    std::string raw = ReadFile(argv[4]);
    std::vector<uint8_t> rgb(raw.begin(), raw.end());
    guetzli::JPEGData jpg;
    if (!guetzli::EncodeRGBToJpeg(rgb, w, h, &jpg)) return 1;
    FILE* cf = fopen(argv[5], "wb");
    for (const auto& c : jpg.components)
      fwrite(c.coeffs.data(), sizeof(guetzli::coeff_t), c.coeffs.size(), cf);
    fclose(cf);
    printf("nblocks=%d\n", jpg.components[0].num_blocks);
    return 0;
  }
  if (mode == "roundtrip_outputimage") {
    // roundtrip_outputimage <in.jpg> <out.jpg>: ReadJpeg ->
    // OutputImage::CopyFromJpegData -> SaveToJpegData -> WriteJpeg.
    // Exercises dequantize + requantize + padding-block semantics.
    std::string in = ReadFile(argv[2]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    guetzli::OutputImage img(jpg.width, jpg.height);
    img.CopyFromJpegData(jpg);
    guetzli::JPEGData out_jpg;
    img.SaveToJpegData(&out_jpg);
    std::string out;
    auto append = [](void* data, const uint8_t* buf, size_t count) -> int {
      ((std::string*)data)->append((const char*)buf, count);
      return (int)count;
    };
    guetzli::JPEGOutput writer(append, &out);
    if (!guetzli::WriteJpeg(out_jpg, true, writer)) return 1;
    WriteFile(argv[3], out.data(), out.size());
    return 0;
  }
  if (mode == "block_compare") {
    // block_compare <w> <h> <rgb.raw> <quality> <state.jpg> <out.f32>
    // Per-block CompareBlock error of the state image vs the original,
    // through the reference's public comparator API.
    int w = atoi(argv[2]), h = atoi(argv[3]);
    std::string raw = ReadFile(argv[4]);
    std::vector<uint8_t> rgb(raw.begin(), raw.end());
    double target = guetzli::ButteraugliScoreForQuality(atof(argv[5]));
    std::string in = ReadFile(argv[6]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    guetzli::OutputImage img(jpg.width, jpg.height);
    img.CopyFromJpegData(jpg);
    guetzli::ProcessStats stats;
    guetzli::ButteraugliComparator cmp(w, h, &rgb, target, &stats);
    cmp.StartBlockComparisons();
    int fx = img.component(0).factor_x(), fy = img.component(0).factor_y();
    int bw = (w + 8 * fx - 1) / (8 * fx), bh = (h + 8 * fy - 1) / (8 * fy);
    std::vector<float> errs;
    for (int by = 0; by < bh; ++by)
      for (int bx = 0; bx < bw; ++bx) {
        cmp.SwitchBlock(bx, by, fx, fy);
        errs.push_back(cmp.CompareBlock(img, 0, 0));
      }
    WriteFile(argv[7], errs.data(), errs.size() * sizeof(float));
    return 0;
  }
  if (mode == "block_weights") {
    // block_weights <w> <h> <rgb.raw> <quality> <state.jpg> <dir> <rblock>
    //               <out.f32>
    int w = atoi(argv[2]), h = atoi(argv[3]);
    std::string raw = ReadFile(argv[4]);
    std::vector<uint8_t> rgb(raw.begin(), raw.end());
    double target = guetzli::ButteraugliScoreForQuality(atof(argv[5]));
    std::string in = ReadFile(argv[6]);
    int dir = atoi(argv[7]);
    int rblock = atoi(argv[8]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    guetzli::OutputImage img(jpg.width, jpg.height);
    img.CopyFromJpegData(jpg);
    guetzli::ProcessStats stats;
    guetzli::ButteraugliComparator cmp(w, h, &rgb, target, &stats);
    cmp.Compare(img);
    printf("distance=%.8f\n", cmp.distmap_aggregate());
    int bw = (w + 7) / 8, bh = (h + 7) / 8;
    std::vector<float> weights(bw * bh);
    cmp.ComputeBlockErrorAdjustmentWeights(dir, rblock, 1.0, 1, 1,
                                           cmp.distmap(), &weights);
    WriteFile(argv[9], weights.data(), weights.size() * sizeof(float));
    return 0;
  }

  if (mode == "zeroing_order") {
    // zeroing_order <w> <h> <rgb.raw> <quality> <state.jpg> <orig.jpg>
    //               <b0> <b1> <out.bin>
    // Replicates the reference's greedy per-block zeroing (processor.cc:
    // 364-467) through the public comparator API and dumps (idx, err)
    // sequences for blocks [b0, b1).
    int w = atoi(argv[2]), h = atoi(argv[3]);
    std::string raw = ReadFile(argv[4]);
    std::vector<uint8_t> rgb(raw.begin(), raw.end());
    double target = guetzli::ButteraugliScoreForQuality(atof(argv[5]));
    std::string in = ReadFile(argv[6]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    std::string in_orig = ReadFile(argv[7]);
    guetzli::JPEGData jpg_orig;
    if (!guetzli::ReadJpeg(in_orig, guetzli::JPEG_READ_ALL, &jpg_orig))
      return 1;
    // dequantize jpg_orig in place (RemoveOriginalQuantization equivalent)
    for (int c = 0; c < 3; ++c) {
      auto& comp = jpg_orig.components[c];
      const auto& qv = jpg_orig.quant[comp.quant_idx].values;
      for (size_t j = 0; j < comp.coeffs.size(); ++j)
        comp.coeffs[j] *= qv[j % 64];
    }
    int b0 = atoi(argv[8]), b1 = atoi(argv[9]);
    guetzli::OutputImage img(jpg.width, jpg.height);
    img.CopyFromJpegData(jpg);
    guetzli::ProcessStats stats;
    guetzli::ButteraugliComparator cmp(w, h, &rgb, target, &stats);
    cmp.StartBlockComparisons();
#include "guetzli/order.inc"
    int bw = (w + 7) / 8;
    FILE* f = fopen(argv[10], "wb");
    for (int bix = b0; bix < b1; ++bix) {
      int bx = bix % bw, by = bix / bw;
      guetzli::coeff_t block[192];
      guetzli::coeff_t orig_block[192];
      for (int c = 0; c < 3; ++c) {
        img.component(c).GetCoeffBlock(bx, by, &block[c * 64]);
        const auto& comp = jpg_orig.components[c];
        int jix = by * comp.width_in_blocks + bx;
        memcpy(&orig_block[c * 64], &comp.coeffs[jix * 64],
               64 * sizeof(guetzli::coeff_t));
      }
      std::vector<std::pair<int, float> > order;
      for (int c = 0; c < 3; ++c)
        for (int k = 1; k < 64; ++k) {
          int idx = c * 64 + k;
          if (block[idx] != 0)
            order.push_back(std::make_pair(idx,
                std::abs(orig_block[idx]) * csf[idx] + bias[idx]));
        }
      std::sort(order.begin(), order.end(),
                [](const std::pair<int, float>& a,
                   const std::pair<int, float>& b) {
                  return a.second < b.second; });
      guetzli::coeff_t processed[192];
      memcpy(processed, block, sizeof(processed));
      cmp.SwitchBlock(bx, by, 1, 1);
      std::vector<int> out_idx;
      std::vector<float> out_err;
      while (!order.empty()) {
        float best_err = 1e17f;
        size_t best_i = 0;
        for (size_t i = 0; i < std::min<size_t>(3, order.size()); ++i) {
          guetzli::coeff_t cand[192];
          memcpy(cand, processed, sizeof(cand));
          cand[order[i].first] = 0;
          for (int c = 0; c < 3; ++c)
            img.component(c).SetCoeffBlock(bx, by, &cand[c * 64]);
          float err = (float)cmp.CompareBlock(img, 0, 0);
          if (err < best_err) { best_err = err; best_i = i; }
        }
        int idx = order[best_i].first;
        processed[idx] = 0;
        order.erase(order.begin() + best_i);
        out_idx.push_back(idx);
        out_err.push_back(best_err);
        for (int c = 0; c < 3; ++c)
          img.component(c).SetCoeffBlock(bx, by, &processed[c * 64]);
      }
      for (int c = 0; c < 3; ++c)
        img.component(c).SetCoeffBlock(bx, by, &block[c * 64]);
      int n = (int)out_idx.size();
      fwrite(&n, 4, 1, f);
      for (int i = 0; i < n; ++i) {
        fwrite(&out_idx[i], 4, 1, f);
        fwrite(&out_err[i], 4, 1, f);
      }
    }
    fclose(f);
    return 0;
  }
  if (mode == "decode_rgb") {
    std::string in = ReadFile(argv[2]);
    guetzli::JPEGData jpg;
    if (!guetzli::ReadJpeg(in, guetzli::JPEG_READ_ALL, &jpg)) return 1;
    std::vector<uint8_t> rgb = guetzli::DecodeJpegToRGB(jpg);
    if (rgb.empty()) { fprintf(stderr, "unsupported layout\n"); return 1; }
    WriteFile(argv[3], rgb.data(), rgb.size());
    printf("width=%d height=%d\n", jpg.width, jpg.height);
    return 0;
  }
  if (mode == "opsin") {
    size_t w = atoi(argv[2]), h = atoi(argv[3]);
    std::string r = ReadFile(argv[4]);
    std::vector<uint8_t> v(r.begin(), r.end());
    auto planes = PlanesFromRGB(v, w, h);
    auto xyb = butteraugli::OpsinDynamicsImage(planes);
    std::vector<float> buf(3 * w * h);
    for (int c = 0; c < 3; ++c)
      for (size_t y = 0; y < h; ++y)
        memcpy(&buf[(c * h + y) * w], xyb[c].Row(y), w * sizeof(float));
    WriteFile(argv[5], buf.data(), buf.size() * sizeof(float));
    return 0;
  }
  if (mode == "blur") {
    size_t w = atoi(argv[2]), h = atoi(argv[3]);
    std::string r = ReadFile(argv[4]);
    double sigma = atof(argv[5]);
    double border = atof(argv[6]);
    butteraugli::ImageF img(w, h);
    for (size_t y = 0; y < h; ++y)
      memcpy(img.Row(y), r.data() + y * w * 4, w * sizeof(float));
    butteraugli::ImageF out = butteraugli::Blur(img, sigma, border);
    std::vector<float> buf(w * h);
    for (size_t y = 0; y < h; ++y)
      memcpy(&buf[y * w], out.Row(y), w * sizeof(float));
    WriteFile(argv[7], buf.data(), buf.size() * sizeof(float));
    return 0;
  }
  if (mode == "mask") {
    size_t w = atoi(argv[2]), h = atoi(argv[3]);
    std::string r0 = ReadFile(argv[4]), r1 = ReadFile(argv[5]);
    std::vector<uint8_t> v0(r0.begin(), r0.end()), v1(r1.begin(), r1.end());
    auto p0 = PlanesFromRGB(v0, w, h);
    auto p1 = PlanesFromRGB(v1, w, h);
    std::vector<butteraugli::ImageF> mask, mask_dc;
    butteraugli::Mask(p0, p1, &mask, &mask_dc);
    std::vector<float> buf(6 * w * h);
    for (int c = 0; c < 3; ++c)
      for (size_t y = 0; y < h; ++y) {
        memcpy(&buf[(c * h + y) * w], mask[c].Row(y), w * sizeof(float));
        memcpy(&buf[((3 + c) * h + y) * w], mask_dc[c].Row(y), w * sizeof(float));
      }
    WriteFile(argv[6], buf.data(), buf.size() * sizeof(float));
    return 0;
  }
  fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
