// PSKreporter IPFIX frame builder + UDP sender — native C++.
//
// Wire format reproduced from the reference's postSpots
// (/root/reference/rtlsdr_ft8d.c:365-590): 16-byte header (version 0x000A,
// length, unix time, sequence, random session id), RX/TX template
// descriptors (enterprise 0x768F fields), variable-length receiver record,
// spot records (call, freq u32, snr i8, mode, locator, source u8, time
// u32), 4-byte alignment padding, 1200-byte spot budget.
//
// Deliberately NOT inherited from the reference: the uninitialized-`res`
// getaddrinfo loop (c:569, undefined behavior — SURVEY.md §8) and the
// unconditional early `return` disabling the uplink (c:366); sending here
// is explicit and the caller gates it on --noreport.

#include <arpa/inet.h>
#include <cstdint>
#include <cstring>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

const unsigned char kRxDescriptor[] = {
    0x00, 0x03, 0x00, 0x24, 0x99, 0x92, 0x00, 0x03, 0x00, 0x00,
    0x80, 0x02, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x04, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x08, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x00, 0x00};

const unsigned char kTxDescriptor[] = {
    0x00, 0x02, 0x00, 0x3C, 0x99, 0x93, 0x00, 0x07,
    0x80, 0x01, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x05, 0x00, 0x04, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x06, 0x00, 0x01, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x0A, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x03, 0xFF, 0xFF, 0x00, 0x00, 0x76, 0x8F,
    0x80, 0x0B, 0x00, 0x01, 0x00, 0x00, 0x76, 0x8F,
    0x00, 0x96, 0x00, 0x04};

void put_u16(uint8_t* p, uint16_t v) { v = htons(v); memcpy(p, &v, 2); }
void put_u32(uint8_t* p, uint32_t v) { v = htonl(v); memcpy(p, &v, 4); }

// Writes a length-prefixed string, clamped to BOTH the 255-byte wire
// limit and `room` (bytes available incl. the length byte) — rx_call /
// rx_loc come from user config, and unbounded writes could overflow the
// fixed rx_info stack buffer before the total-size check runs.
size_t put_str(uint8_t* p, const char* s, size_t room) {
  if (room == 0) return 0;
  size_t len = strlen(s);
  size_t cap = room - 1 < 255 ? room - 1 : 255;
  if (len > cap) len = cap;
  p[0] = static_cast<uint8_t>(len);
  memcpy(p + 1, s, len);
  return len + 1;
}

}  // namespace

extern "C" {

struct Ft8Spot {
  char call[16];
  char locator[8];
  uint32_t freq_hz;   // absolute RF frequency
  int8_t snr_db;
  uint32_t epoch;     // window start time
};

// Build a frame into `out` (capacity `cap`); returns frame length or -1.
int ipfix_build_frame(uint8_t* out, int cap, const char* rx_call,
                      const char* rx_loc, const char* app_version,
                      const struct Ft8Spot* spots, int n_spots,
                      uint32_t epoch, uint32_t sequence,
                      uint32_t session_id) {
  uint8_t rx_info[256] = {0};
  size_t rx_ptr = 4;
  put_u16(rx_info, 0x9992);
  // reserve 3 bytes for the trailing 4-byte alignment pad
  rx_ptr += put_str(rx_info + rx_ptr, rx_call,
                    sizeof(rx_info) - rx_ptr - 3);
  rx_ptr += put_str(rx_info + rx_ptr, rx_loc,
                    sizeof(rx_info) - rx_ptr - 3);
  rx_ptr += put_str(rx_info + rx_ptr, app_version,
                    sizeof(rx_info) - rx_ptr - 3);
  if (rx_ptr % 4) rx_ptr += 4 - (rx_ptr % 4);
  put_u16(rx_info + 2, static_cast<uint16_t>(rx_ptr));

  uint8_t tx_info[1500] = {0};
  size_t tx_ptr = 4;
  put_u16(tx_info, 0x9993);
  for (int i = 0; i < n_spots; ++i) {
    if (tx_ptr > 1200) break;  // reference's per-frame spot budget (c:497)
    tx_ptr += put_str(tx_info + tx_ptr, spots[i].call,
                      sizeof(tx_info) - tx_ptr);
    put_u32(tx_info + tx_ptr, spots[i].freq_hz); tx_ptr += 4;
    tx_info[tx_ptr++] = static_cast<uint8_t>(spots[i].snr_db);
    tx_ptr += put_str(tx_info + tx_ptr, "FT8", sizeof(tx_info) - tx_ptr);
    tx_ptr += put_str(tx_info + tx_ptr, spots[i].locator,
                      sizeof(tx_info) - tx_ptr);
    tx_info[tx_ptr++] = 1;  // information source: automatic extraction
    put_u32(tx_info + tx_ptr, spots[i].epoch); tx_ptr += 4;
  }
  if (tx_ptr % 4) tx_ptr += 4 - (tx_ptr % 4);
  put_u16(tx_info + 2, static_cast<uint16_t>(tx_ptr));

  size_t total = 16 + sizeof(kRxDescriptor) + sizeof(kTxDescriptor) +
                 rx_ptr + tx_ptr;
  if (static_cast<int>(total) > cap) return -1;

  uint8_t* p = out;
  put_u16(p, 0x000A);
  put_u16(p + 2, static_cast<uint16_t>(total));
  put_u32(p + 4, epoch);
  put_u32(p + 8, sequence);
  put_u32(p + 12, session_id);
  p += 16;
  memcpy(p, kRxDescriptor, sizeof(kRxDescriptor)); p += sizeof(kRxDescriptor);
  memcpy(p, kTxDescriptor, sizeof(kTxDescriptor)); p += sizeof(kTxDescriptor);
  memcpy(p, rx_info, rx_ptr); p += rx_ptr;
  memcpy(p, tx_info, tx_ptr);
  return static_cast<int>(total);
}

// Send a frame via UDP; returns 0 on success, negative errno-style code.
int ipfix_send_udp(const char* host, const char* service, const uint8_t* buf,
                   int len) {
  struct addrinfo hints, *res = nullptr;
  memset(&hints, 0, sizeof hints);
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_DGRAM;
  if (getaddrinfo(host, service, &hints, &res)) return -1;
  int fd = -1;
  struct addrinfo* rp;
  for (rp = res; rp; rp = rp->ai_next) {
    fd = socket(rp->ai_family, rp->ai_socktype, rp->ai_protocol);
    if (fd == -1) continue;
    if (connect(fd, rp->ai_addr, rp->ai_addrlen) != -1) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd == -1) return -2;
  ssize_t sent = send(fd, buf, len, 0);
  close(fd);
  return sent == len ? 0 : -3;
}

}  // extern "C"
