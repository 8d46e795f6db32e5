package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Readability, code-detection, date-extraction, and citation
  * signals: hand-computed goldens per rule arm. */
class TextSignalsSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def one[T](c: org.apache.spark.sql.Column, text: String)(
      implicit enc: org.apache.spark.sql.Encoder[T]): T = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).as[T].collect().head
  }

  "readability" should "count words, syllables, sentences exactly" in {
    val s = spark
    import s.implicits._
    // "the cat sat. It was flat!" -> 6 words; syllables: the=1 cat=1
    // sat=1 it=1 was=1 flat=1 = 6; sentences: "." "!" = 2
    val r = Seq("the cat sat. It was flat!").toDF("text")
      .select(TextOps.readability(col("text")).as("r"))
      .select("r.n_words", "r.n_syllables", "r.n_sentences")
      .as[(Long, Long, Long)].collect().head
    r shouldBe ((6L, 6L, 2L))
  }

  it should "clamp vowel-free words and terminator-free text to 1" in {
    val s = spark
    import s.implicits._
    val r = Seq("mr shh tv").toDF("text")
      .select(TextOps.readability(col("text")).as("r"))
      .select("r.n_words", "r.n_syllables", "r.n_sentences")
      .as[(Long, Long, Long)].collect().head
    r shouldBe ((3L, 3L, 1L))
  }

  it should "compute the Flesch scores in exact 1e-4 units" in {
    val s = spark
    import s.implicits._
    // 6 words / 2 sentences, 6 syllables / 6 words:
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19 -> 1191900
    // fk = 0.39*3 + 11.8*1 - 15.59 = -2.62 -> -26200
    val r = Seq("the cat sat. It was flat!").toDF("text")
      .select(TextOps.readability(col("text")).as("r"))
      .select("r.flesch_e4", "r.fk_grade_e4")
      .as[(Long, Long)].collect().head
    r shouldBe ((1191900L, -26200L))
  }

  "codeSignals" should "count structure and fire the flag on code" in {
    val s = spark
    import s.implicits._
    val code = "function f(x) { return x; } // c\nif (a == b) { y = 0; }"
    val r = Seq(code).toDF("text")
      .select(TextOps.codeSignals(col("text")).as("c"))
      .select("c.n_braces", "c.n_semicolons", "c.n_compare",
        "c.n_comments", "c.n_keywords", "c.is_code")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    r shouldBe ((4L, 2L, 1L, 1L, 3L, 1L))
  }

  it should "stay quiet on prose" in {
    val s = spark
    import s.implicits._
    val r = Seq("plain prose with words and no structure at all")
      .toDF("text").select(TextOps.codeSignals(col("text")).as("c"))
      .select("c.n_braces", "c.is_code")
      .as[(Long, Long)].collect().head
    r shouldBe ((0L, 0L))
  }

  private def date(t: String): (Long, Long, Long, Long) = {
    val s = spark
    import s.implicits._
    Seq(t).toDF("text").select(TextOps.dateExtract(col("text")).as("d"))
      .select("d.found", "d.y", "d.m", "d.d")
      .as[(Long, Long, Long, Long)].collect().head
  }

  "dateExtract" should "read ISO dates" in {
    date("released 2021-03-05 worldwide") shouldBe ((1L, 2021L, 3L, 5L))
  }

  it should "read long-form month-name dates" in {
    date("Updated March 7, 2019 edition") shouldBe ((1L, 2019L, 3L, 7L))
    date("By December 31, 1999.") shouldBe ((1L, 1999L, 12L, 31L))
  }

  it should "prefer ISO when both appear and reject junk" in {
    date("May 1, 2020 then 2022-06-07") shouldBe ((1L, 2022L, 6L, 7L))
    date("version 3.14 on 2021-13-40 nope") shouldBe ((0L, 0L, 0L, 0L))
    date("no dates at all") shouldBe ((0L, 0L, 0L, 0L))
  }

  "citations" should "extract DOIs with trailing-punctuation cleanup" in {
    val s = spark
    import s.implicits._
    val r = Seq("see doi:10.1000/j.x-1(2);3 and 10.5555/abc. Next.")
      .toDF("text").select(TextOps.citations(col("text")).as("c"))
      .select("c.dois").as[Seq[String]].collect().head
    r shouldBe Seq("10.1000/j.x-1(2);3", "10.5555/abc")
  }

  it should "extract new-style arXiv ids with optional version" in {
    val s = spark
    import s.implicits._
    val r = Seq("arXiv:2101.00123 and arXiv:1912.1234v2 end")
      .toDF("text").select(TextOps.citations(col("text")).as("c"))
      .select("c.arxiv").as[Seq[String]].collect().head
    r shouldBe Seq("2101.00123", "1912.1234v2")
  }

  private def lic(t: String): (String, Long) = {
    val s = spark
    import s.implicits._
    Seq(t).toDF("text").select(TextOps.licenseDetect(col("text")).as("l"))
      .select("l.license", "l.matched").as[(String, Long)].collect().head
  }

  "licenseDetect" should "prefer an explicit SPDX identifier" in {
    lic("Permission is hereby granted, free of charge\n" +
      "SPDX-License-Identifier: Apache-2.0") shouldBe (("Apache-2.0", 1L))
  }

  it should "recognize characteristic phrases per license" in {
    lic("under the Apache License, Version 2.0")._1 shouldBe "Apache-2.0"
    lic("the GNU General Public License as published by the Free " +
      "Software Foundation, version 3")._1 shouldBe "GPL-3.0"
    lic("the GNU Lesser General Public License, version 3")._1 shouldBe
      "LGPL-3.0"
    lic("the GNU Affero General Public License v. version 3")._1 shouldBe
      "AGPL-3.0"
    lic("Permission is hereby granted, free of charge, to any person")
      ._1 shouldBe "MIT"
    lic("Redistribution and use in source and binary forms")._1 shouldBe
      "BSD-3-Clause"
    lic("licensed under Creative Commons Attribution 4.0")._1 shouldBe
      "CC-BY-4.0"
  }

  it should "return none when nothing fires" in {
    lic("plain prose about licensing in general") shouldBe (("none", 0L))
  }
}
