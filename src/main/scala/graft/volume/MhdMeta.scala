package graft.volume

import graft.io.{Fio, FioConf}

/** Parsed MHD (MetaImage) header.
  *
  * Mirrors the reference's `parse_mhd` / `mhd_memmap` semantics
  * (upscale_streaming.py:23–57, upscale_streaming_enhance.py:42–76):
  *  - key = value lines; DimSize/ElementSpacing parsed as number lists
  *    split on spaces/commas;
  *  - required fields: DimSize, ElementType, ElementDataFile;
  *  - `DimSize` is X Y Z order but the raw array is laid out C-order
  *    (Z, Y, X) — the single place this axis flip is encoded;
  *  - `ByteOrderMSB = True` means the raw file is big-endian;
  *  - `ElementDataFile` is resolved relative to the .mhd directory.
  */
final case class MhdMeta(
    dimX: Long,
    dimY: Long,
    dimZ: Long,
    elementType: String,
    spacingXyz: (Double, Double, Double),
    byteOrderMsb: Boolean,
    dataFile: String,
    mhdDir: String,
) {
  /** Array shape in storage order. */
  def shapeZyx: (Long, Long, Long) = (dimZ, dimY, dimX)

  def bytesPerVoxel: Int = MhdMeta.BytesPerVoxel(elementType)

  /** True for MET_FLOAT / MET_DOUBLE. */
  def isFloating: Boolean = elementType == "MET_FLOAT" || elementType == "MET_DOUBLE"

  /** True for the unsigned integer types (widened on decode). */
  def isUnsigned: Boolean = elementType.startsWith("MET_U")

  def rawPath: String = Fio.child(mhdDir, dataFile)

  def nVoxels: Long = dimX * dimY * dimZ

  /** Physical volume per axis in millimetres (print_metadata.py:13). */
  def physicalSizeMmZyx: (Double, Double, Double) = {
    val (sx, sy, sz) = spacingXyz
    (dimZ * sz / 1000.0, dimY * sy / 1000.0, dimX * sx / 1000.0)
  }
}

object MhdMeta {

  /** The complete supported scalar universe (upscale_streaming.py:12–21). */
  val BytesPerVoxel: Map[String, Int] = Map(
    "MET_UCHAR" -> 1,
    "MET_CHAR" -> 1,
    "MET_USHORT" -> 2,
    "MET_SHORT" -> 2,
    "MET_UINT" -> 4,
    "MET_INT" -> 4,
    "MET_FLOAT" -> 4,
    "MET_DOUBLE" -> 8,
  )

  def parse(mhdPath: String)(implicit fc: FioConf): MhdMeta = {
    val path = Fio.qualify(mhdPath)
    val fields = scala.collection.mutable.Map[String, String]()
    Fio.readLines(path).foreach { line =>
      val i = line.indexOf('=')
      if (i >= 0) {
        fields(line.take(i).trim) = line.drop(i + 1).trim
      }
    }
    for (req <- Seq("DimSize", "ElementType", "ElementDataFile")) {
      require(
        fields.contains(req),
        s"MHD missing required fields (DimSize, ElementType, ElementDataFile): lacks $req")
    }
    def nums(v: String): Seq[Double] =
      v.split("[ ,]").filter(_.nonEmpty).toSeq.map(_.toDouble)

    val dims = nums(fields("DimSize")).map(_.toLong)
    require(dims.length == 3, s"DimSize must have 3 components, got ${dims.length}")
    val elementType = fields("ElementType")
    require(BytesPerVoxel.contains(elementType), s"Unsupported ElementType: $elementType")
    val spacing = fields.get("ElementSpacing").map(nums).getOrElse(Seq(1.0, 1.0, 1.0))
    val msb = fields.get("ByteOrderMSB").exists(_.equalsIgnoreCase("true"))

    MhdMeta(
      dimX = dims(0),
      dimY = dims(1),
      dimZ = dims(2),
      elementType = elementType,
      spacingXyz = (spacing(0), spacing(1), spacing(2)),
      byteOrderMsb = msb,
      dataFile = fields("ElementDataFile"),
      mhdDir = Fio.parent(path),
    )
  }
}
