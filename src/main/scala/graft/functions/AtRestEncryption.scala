package graft.functions

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encryption at rest for buffered change data — the reference's
  * CMEK surface (pkg/config/encryption.go EnableEncryption;
  * pkg/encryption/cipher.go AES data keys over the eventstore /
  * schemastore / large-txn-spill files).
  *
  * Spark-first shape: COLUMN-level envelope encryption with the
  * engine's native codegen'd `aes_encrypt`/`aes_decrypt` (AES-GCM,
  * fresh random IV per value, authenticated). The reference's key
  * hierarchy is kept: a random 256-bit DATA key seals rows, and the
  * data key itself is stored only WRAPPED by the master key (AES-GCM
  * key wrap, driver-side) in a small meta file next to the data —
  * master-key rotation re-wraps one 32-byte secret and never touches
  * data files. Executors see the data key as an expression literal,
  * exactly like any Spark credential; sealing/unsealing runs at scan
  * speed inside codegen, so the path is 100 TB-safe by construction
  * (zero shuffle, zero driver involvement per row).
  */
object AtRestEncryption {

  private val GcmIvBytes = 12
  private val GcmTagBits = 128

  /** Fresh random 256-bit data key. */
  def newDataKey(): Array[Byte] = {
    val k = new Array[Byte](32)
    new SecureRandom().nextBytes(k)
    k
  }

  /** AES-GCM wrap: [12-byte IV || ciphertext+tag]. Driver-side,
    * control-plane-sized (wraps a 32-byte key, not data). */
  def wrapKey(dataKey: Array[Byte], masterKey: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](GcmIvBytes)
    new SecureRandom().nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(masterKey, "AES"),
      new GCMParameterSpec(GcmTagBits, iv))
    iv ++ c.doFinal(dataKey)
  }

  /** Inverse of [[wrapKey]]; throws AEADBadTagException on a wrong
    * master key (authenticated — corruption never yields a key). */
  def unwrapKey(wrapped: Array[Byte], masterKey: Array[Byte]): Array[Byte] = {
    val (iv, ct) = wrapped.splitAt(GcmIvBytes)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(masterKey, "AES"),
      new GCMParameterSpec(GcmTagBits, iv))
    c.doFinal(ct)
  }

  /** Seal a column (string or binary) to authenticated ciphertext. */
  def sealColumn(c: Column, dataKey: Array[Byte]): Column =
    aes_encrypt(c.cast("binary"), lit(dataKey), lit("GCM"))

  /** Open a sealed column back to its binary plaintext. */
  def openColumn(c: Column, dataKey: Array[Byte]): Column =
    aes_decrypt(c, lit(dataKey), lit("GCM"))

  /** Open a sealed column that held UTF-8 text (e.g. a JSON row). */
  def openStringColumn(c: Column, dataKey: Array[Byte]): Column =
    openColumn(c, dataKey).cast("string")

  // ---- key-file bookkeeping (CMEK meta next to the data) ----

  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String) = java.util.Base64.getDecoder.decode(s)

  /** Create-or-load the directory's data key: the wrapped key (and
    * any caller payload, e.g. a schema DDL) lives in `dir/KEYMETA`.
    * Idempotent; rotation = [[rewrapKeyFile]]. */
  def ensureKeyFile(dir: String, masterKey: Array[Byte],
                    payload: String = ""): Array[Byte] = {
    val path = java.nio.file.Paths.get(dir, "KEYMETA")
    if (java.nio.file.Files.exists(path)) {
      loadKeyFile(dir, masterKey)._1
    } else {
      java.nio.file.Files.createDirectories(path.getParent)
      val key = newDataKey()
      java.nio.file.Files.writeString(path,
        s"""{"wrapped":"${b64(wrapKey(key, masterKey))}","payload":${
          com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(payload)}}""")
      key
    }
  }

  /** (data key, payload) from `dir/KEYMETA`. */
  def loadKeyFile(dir: String, masterKey: Array[Byte]): (Array[Byte], String) = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "KEYMETA")))
    (unwrapKey(unb64(node.get("wrapped").asText()), masterKey),
      node.get("payload").asText())
  }

  /** Master-key rotation: re-wrap the data key under the new master.
    * One 32-byte secret changes hands; data files are untouched. */
  def rewrapKeyFile(dir: String, oldMaster: Array[Byte],
                    newMaster: Array[Byte]): Unit = {
    val path = java.nio.file.Paths.get(dir, "KEYMETA")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    val key = unwrapKey(unb64(node.get("wrapped").asText()), oldMaster)
    val out = mapper.createObjectNode()
    out.put("wrapped", b64(wrapKey(key, newMaster)))
    out.set("payload", node.get("payload"))
    java.nio.file.Files.writeString(path, mapper.writeValueAsString(out))
  }
}
