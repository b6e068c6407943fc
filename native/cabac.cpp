// cabac.cpp — spec constant tables + context initialization.
// Tables are ITU-T H.265 constants (Tables 9-46/9-47 and the context
// initValue tables 9-5..9-32); rows ordered [B, P, I] as in the spec's
// initType mapping (I -> initType 0 stored at row 2 here).
#include "cabac.h"

namespace hevc {

const uint8_t kLpsTable[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2}};

const uint8_t kNextStateLps[64] = {
    0,  0,  1,  2,  2,  4,  4,  5,  6,  7,  8,  9,  9,  11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63};

const uint8_t kRenormTable[32] = {6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2,
                                  2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
                                  1, 1, 1, 1, 1, 1, 1, 1, 1, 1};

namespace {
constexpr uint8_t CNU = 154;

// init tables, rows [B, P, I]
const uint8_t kInitSplitCu[3][3] = {
    {107, 139, 126}, {107, 139, 126}, {139, 141, 157}};
const uint8_t kInitSkip[3][3] = {
    {197, 185, 201}, {197, 185, 201}, {CNU, CNU, CNU}};
const uint8_t kInitMergeFlag[3][1] = {{154}, {110}, {CNU}};
const uint8_t kInitMergeIdx[3][1] = {{137}, {122}, {CNU}};
const uint8_t kInitPartSize[3][4] = {{154, 139, 154, 154},
                                     {154, 139, 154, 154},
                                     {184, CNU, CNU, CNU}};
const uint8_t kInitPredMode[3][1] = {{134}, {149}, {CNU}};
const uint8_t kInitIntraLuma[3][1] = {{183}, {154}, {184}};
const uint8_t kInitChromaPred[3][2] = {{152, 139}, {152, 139}, {63, 139}};
const uint8_t kInitInterDir[3][5] = {{95, 79, 63, 31, 31},
                                     {95, 79, 63, 31, 31},
                                     {CNU, CNU, CNU, CNU, CNU}};
const uint8_t kInitMvd[3][2] = {{169, 198}, {140, 198}, {CNU, CNU}};
const uint8_t kInitRefPic[3][2] = {{153, 153}, {153, 153}, {CNU, CNU}};
const uint8_t kInitDqp[3][3] = {{154, 154, 154}, {154, 154, 154},
                                {154, 154, 154}};
const uint8_t kInitCbf[3][8] = {
    {153, 111, CNU, CNU, 149, 92, 167, 154},
    {153, 111, CNU, CNU, 149, 107, 167, 154},
    {111, 141, CNU, CNU, 94, 138, 182, 154}};
const uint8_t kInitRootCbf[3][1] = {{79}, {79}, {CNU}};
const uint8_t kInitLast[3][30] = {
    {125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
     79, 108, 123, 93, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU,
     CNU, CNU},
    {125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95,
     94, 108, 123, 108, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU,
     CNU, CNU},
    {110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
     79, 108, 123, 63, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU, CNU,
     CNU, CNU}};
const uint8_t kInitSigCg[3][4] = {
    {121, 140, 61, 154}, {121, 140, 61, 154}, {91, 171, 134, 141}};
const uint8_t kInitSig[3][42] = {
    {170, 154, 139, 153, 139, 123, 123, 63,  124, 166, 183, 140, 136, 153,
     154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
     153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183, 140},
    {155, 154, 139, 153, 139, 123, 123, 63,  153, 166, 183, 140, 136, 153,
     154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
     153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140},
    {111, 111, 125, 110, 110, 94,  124, 108, 124, 107, 125, 141, 179, 153,
     125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140,
     139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111}};
const uint8_t kInitOne[3][24] = {
    {154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136,
     153, 121, 136, 122, 169, 208, 166, 167, 154, 152, 167, 182},
    {154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136,
     153, 121, 136, 137, 169, 194, 166, 167, 154, 167, 137, 182},
    {140, 92,  137, 138, 140, 152, 138, 139, 153, 74,  149, 92,
     139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197}};
const uint8_t kInitAbs[3][6] = {{107, 167, 91, 107, 107, 167},
                                {107, 167, 91, 122, 107, 167},
                                {138, 153, 136, 167, 152, 152}};
const uint8_t kInitMvpIdx[3][1] = {{168}, {168}, {CNU}};
const uint8_t kInitSaoMerge[3][1] = {{153}, {153}, {153}};
const uint8_t kInitSaoType[3][1] = {{160}, {185}, {200}};
const uint8_t kInitTransSubdiv[3][3] = {
    {224, 167, 122}, {124, 138, 94}, {153, 138, 138}};
const uint8_t kInitTqBypass[3][1] = {{154}, {154}, {154}};
}  // namespace

void ContextSet::init(int slice_type, int qp) {
  const int st = slice_type;  // rows indexed by slice type [B,P,I]
  auto load = [&](int off, const uint8_t* tab, int n) {
    for (int i = 0; i < n; ++i) ctx[off + i] = ctx_init(tab[i], qp);
  };
  load(CTX_SPLIT_CU, kInitSplitCu[st], 3);
  load(CTX_SKIP, kInitSkip[st], 3);
  load(CTX_MERGE_FLAG, kInitMergeFlag[st], 1);
  load(CTX_MERGE_IDX, kInitMergeIdx[st], 1);
  load(CTX_PART_SIZE, kInitPartSize[st], 4);
  load(CTX_PRED_MODE, kInitPredMode[st], 1);
  load(CTX_INTRA_LUMA, kInitIntraLuma[st], 1);
  load(CTX_CHROMA_PRED, kInitChromaPred[st], 2);
  load(CTX_INTER_DIR, kInitInterDir[st], 5);
  load(CTX_MVD, kInitMvd[st], 2);
  load(CTX_REF_PIC, kInitRefPic[st], 2);
  load(CTX_DQP, kInitDqp[st], 3);
  load(CTX_CBF_LUMA, kInitCbf[st], 4);
  load(CTX_CBF_CHROMA, kInitCbf[st] + 4, 4);
  load(CTX_ROOT_CBF, kInitRootCbf[st], 1);
  load(CTX_LAST_X, kInitLast[st], 30);
  load(CTX_LAST_Y, kInitLast[st], 30);
  load(CTX_SIG_CG, kInitSigCg[st], 4);
  load(CTX_SIG, kInitSig[st], 42);
  load(CTX_ONE, kInitOne[st], 24);
  load(CTX_ABS, kInitAbs[st], 6);
  load(CTX_MVP_IDX, kInitMvpIdx[st], 1);
  load(CTX_SAO_MERGE, kInitSaoMerge[st], 1);
  load(CTX_SAO_TYPE, kInitSaoType[st], 1);
  load(CTX_TRANS_SUBDIV, kInitTransSubdiv[st], 3);
  load(CTX_TQ_BYPASS, kInitTqBypass[st], 1);
}

}  // namespace hevc
